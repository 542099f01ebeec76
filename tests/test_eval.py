"""Validator / SegEvaluator integration on a tiny model + synthetic dataset."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dupl_tpu.config import ModelConfig, DataConfig, voc_config
from dupl_tpu.engine.eval_seg import SegEvaluator
from dupl_tpu.engine.train import Trainer
from dupl_tpu.engine.validate import Validator


class FakeSegDataset:
    """Synthetic val-style dataset with variable image sizes.  Items are
    deterministic per index (independent of access order) so shape-bucketed
    and sequential evaluation see identical data."""

    def __init__(self, n=4, num_classes=21, seed=0, with_sizes=False):
        self.n = n
        self.nc = num_classes
        self.seed = seed
        self.sizes = [(80, 96), (96, 80), (64, 64), (96, 96)]
        if with_sizes:
            self.image_size = lambda i: self.sizes[i % len(self.sizes)]

    def __len__(self):
        return self.n

    def __getitem__(self, i, seed=None):
        rs = np.random.RandomState(self.seed * 1000 + i)
        h, w = self.sizes[i % len(self.sizes)]
        raw = rs.randint(0, 255, (h, w, 3)).astype(np.uint8)
        label = rs.randint(0, self.nc, (h, w)).astype(np.int32)
        cls_label = np.zeros(self.nc - 1, np.float32)
        cls_label[rs.randint(0, self.nc - 1, 3)] = 1
        from dupl_tpu.data.transforms import normalize_img
        return {"name": f"img{i}", "image": normalize_img(raw), "raw_image": raw,
                "label": label, "cls_label": cls_label}


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = voc_config(
        model=ModelConfig(backbone="test_tiny_patch16", compute_dtype="float32"),
        data=DataConfig(crop_size=64),
        cam_scales=(1.0, 0.5),
    )
    trainer = Trainer(cfg)
    params = trainer.model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    return cfg, trainer, params


def test_validator_runs(tiny_setup):
    cfg, trainer, params = tiny_setup
    v = Validator(cfg, trainer.model)
    res = v.run(params, FakeSegDataset())
    for key in ("seg_1_miou", "seg_2_miou", "cam_1_miou", "cam_aux_2_miou",
                "cls_f1_1", "cls_f1_2"):
        assert np.isfinite(res[key]), key
    assert "mIoU" in res["table"]


def test_validator_device_post_matches_host(tiny_setup):
    """device_post=True (on-device resize+threshold, uint8 transfer) must
    reproduce the host-PIL path's scores; the device bilinear is the
    torch-parity op, PIL differs only in final float bits."""
    cfg, trainer, params = tiny_setup
    a = Validator(cfg, trainer.model, device_post=True).run(
        params, FakeSegDataset())
    b = Validator(cfg, trainer.model, device_post=False).run(
        params, FakeSegDataset())
    for key in ("seg_1_miou", "seg_2_miou", "cam_1_miou", "cam_2_miou",
                "cam_aux_1_miou", "cam_aux_2_miou"):
        assert abs(a[key] - b[key]) < 2e-2, (key, a[key], b[key])


def test_validator_bf16_transfer_same_scores(tiny_setup):
    """transfer_dtype='bfloat16' (remote-relay transfer saver for the HOST
    post path) must not move any reported score on the tiny model: CAMs are
    [0, 1]-normalised, so the rounding sits far below the banding
    thresholds."""
    cfg, trainer, params = tiny_setup
    a = Validator(cfg, trainer.model, device_post=False).run(
        params, FakeSegDataset())
    b = Validator(cfg, trainer.model, device_post=False,
                  transfer_dtype="bfloat16").run(params, FakeSegDataset())
    for key in ("seg_1_miou", "seg_2_miou", "cam_1_miou", "cam_2_miou",
                "cam_aux_1_miou", "cam_aux_2_miou"):
        assert abs(a[key] - b[key]) < 5e-3, (key, a[key], b[key])


def test_validator_bf16_noop_under_device_post(tiny_setup):
    """Under device_post (default) the CAMs never leave the chip, so the
    bf16 cast is skipped entirely — scores must be EXACTLY the f32 ones
    (the cast would cost accuracy for zero transfer bytes)."""
    cfg, trainer, params = tiny_setup
    a = Validator(cfg, trainer.model).run(params, FakeSegDataset())
    b = Validator(cfg, trainer.model,
                  transfer_dtype="bfloat16").run(params, FakeSegDataset())
    for key in ("seg_1_miou", "seg_2_miou", "cam_1_miou", "cam_2_miou",
                "cam_aux_1_miou", "cam_aux_2_miou"):
        assert a[key] == b[key], (key, a[key], b[key])


def test_sharded_eval_merges_to_global_metric(tiny_setup):
    """Per-shard runs + merge_shard_results must reproduce the 1-process
    metric exactly (the reference gathers hists across ranks BEFORE its
    branch pick, eval_seg_coco_ddp.py:244-254 — hist sums are exact)."""
    from dupl_tpu.engine.eval_seg import merge_shard_results

    cfg, trainer, params = tiny_setup
    ev = SegEvaluator(cfg, trainer.model, scales=(1.0,), input_mode="fixed")
    ds = FakeSegDataset(n=6)
    full = ev.run(params, ds, crf="none")
    shards = [ev.run(params, ds, crf="none", shard=i, num_shards=2)
              for i in range(2)]
    merged = merge_shard_results(shards)
    np.testing.assert_array_equal(merged["hist_1"], full["hist_1"])
    np.testing.assert_array_equal(merged["hist_2"], full["hist_2"])
    assert merged["branch"] == full["branch"]
    assert merged["seg_score_1"]["miou"] == full["seg_score_1"]["miou"]
    assert merged["seg_score_2"]["miou"] == full["seg_score_2"]["miou"]

    # branch= forces the CRF branch regardless of the local pick
    forced = ev.run(params, ds, crf="none", branch=3 - full["branch"])
    assert forced["branch"] == 3 - full["branch"]


def test_seg_evaluator_no_crf(tiny_setup):
    cfg, trainer, params = tiny_setup
    ev = SegEvaluator(cfg, trainer.model, scales=(1.0, 1.5), merge="max")
    res = ev.run(params, FakeSegDataset(), batch_size=2, crf="none")
    assert res["branch"] in (1, 2)
    assert 0 <= res["seg_score_1"]["miou"] <= 1


def test_seg_evaluator_device_crf(tiny_setup, tmp_path):
    cfg, trainer, params = tiny_setup
    import dataclasses
    from dupl_tpu.config import CrfConfig
    cfg2 = dataclasses.replace(cfg, crf=CrfConfig(iter_max=2))
    ev = SegEvaluator(cfg2, trainer.model, scales=(1.0,), merge="max")
    res = ev.run(params, FakeSegDataset(), batch_size=2, crf="device",
                 out_dir=str(tmp_path))
    assert "crf_score" in res
    import os
    assert len(os.listdir(tmp_path / "seg_preds")) == 4


def test_seg_evaluator_native_mode(tiny_setup, tmp_path):
    """Native-resolution eval: per-shape compiles, device CRF with /8 padding."""
    cfg, trainer, params = tiny_setup
    import dataclasses
    from dupl_tpu.config import CrfConfig
    cfg2 = dataclasses.replace(cfg, crf=CrfConfig(iter_max=2))
    ev = SegEvaluator(cfg2, trainer.model, scales=(1.0,), merge="max",
                      input_mode="native")
    res = ev.run(params, FakeSegDataset(n=3), batch_size=2, crf="device",
                 out_dir=str(tmp_path))
    assert "crf_score" in res
    assert res["branch"] in (1, 2)


def test_native_mode_shape_bucketing(tiny_setup):
    """With ``image_size`` available, native mode batches same-shape images
    (one compile per distinct shape) and must score identically to the
    unbucketed batch-1 fallback (VERDICT r1 item 9: make native mode
    practical via shape bucketing)."""
    cfg, trainer, params = tiny_setup
    ev = SegEvaluator(cfg, trainer.model, scales=(1.0,), merge="max",
                      input_mode="native")
    res_bucketed = ev.run(params, FakeSegDataset(n=8, with_sizes=True),
                          batch_size=4, crf="none")
    ev2 = SegEvaluator(cfg, trainer.model, scales=(1.0,), merge="max",
                       input_mode="native")
    res_single = ev2.run(params, FakeSegDataset(n=8), crf="none")
    for k in (1, 2):
        np.testing.assert_allclose(
            res_bucketed[f"seg_score_{k}"]["miou"],
            res_single[f"seg_score_{k}"]["miou"], rtol=1e-6)


def test_seg_evaluator_ensemble(tiny_setup, tmp_path):
    cfg, trainer, params = tiny_setup
    import dataclasses
    from dupl_tpu.config import CrfConfig
    cfg2 = dataclasses.replace(cfg, crf=CrfConfig(iter_max=2))
    ev = SegEvaluator(cfg2, trainer.model, scales=(1.0,), merge="max")
    res = ev.run(params, FakeSegDataset(n=2), batch_size=2, crf="device",
                 ensemble=True, out_dir=str(tmp_path))
    assert "crf_score" in res


def test_checkpoint_roundtrip(tiny_setup, tmp_path):
    cfg, trainer, params = tiny_setup
    from dupl_tpu.engine import checkpoint as ckpt
    from dupl_tpu.data.pipeline import synthetic_batch

    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(2, crop=64).items()}
    state = trainer.init_state(jax.random.PRNGKey(0), batch["image"][:1])
    path = str(tmp_path / "ckpts")
    import os
    os.makedirs(path)
    ckpt.save_state(path, state)
    assert ckpt.latest_step(path) == 0

    template = trainer.init_state(jax.random.PRNGKey(1), batch["image"][:1])
    restored = ckpt.restore_state(path, template)
    np.testing.assert_allclose(
        np.asarray(restored.params["params"]["classifier"]["kernel"]),
        np.asarray(state.params["params"]["classifier"]["kernel"]))

    # weights-only export/load
    wpath = str(tmp_path / "weights.npz")
    ckpt.export_weights(wpath, state.params)
    loaded = ckpt.load_weights(wpath, template.params)
    np.testing.assert_allclose(
        np.asarray(loaded["params"]["decoder"]["conv6"]["kernel"]),
        np.asarray(state.params["params"]["decoder"]["conv6"]["kernel"]))

    # an interrupted-save temp dir (orbax leaves step_<n>.orbax-...-tmp-...)
    # must never crash resume discovery or pruning — the preemption-resume
    # scenario is exactly when such leftovers exist
    os.makedirs(os.path.join(path, "step_7.orbax-checkpoint-tmp-123"))
    assert ckpt.latest_step(path) == 0
    ckpt.save_state(path, state)  # runs _prune over the dirty directory
    restored2 = ckpt.restore_state(path, template)
    assert int(restored2.step) == 0
    with pytest.raises(ValueError, match="keep must be >= 1"):
        ckpt.save_state(path, state, keep=0)


class _Uint8Wire(FakeSegDataset):
    """Same images as FakeSegDataset but in the uint8 wire format
    (data/voc.py transfer_dtype='uint8': 'image' is the raw uint8 array;
    consumers normalise on device via ops.image.prepare_inputs)."""

    def __getitem__(self, i, seed=None):
        s = super().__getitem__(i, seed=seed)
        return dict(s, image=s["raw_image"])


def test_validator_uint8_wire_same_scores(tiny_setup):
    """uint8 val input (4x less H2D) scores like the f32 wire format: the
    device normalise is the same (u8-mean)/std to <=1 ulp, so only argmax
    ties at the banding thresholds can move — none on the tiny model."""
    cfg, trainer, params = tiny_setup
    a = Validator(cfg, trainer.model).run(params, FakeSegDataset())
    b = Validator(cfg, trainer.model).run(params, _Uint8Wire())
    for key in ("seg_1_miou", "seg_2_miou", "cam_1_miou", "cam_2_miou",
                "cam_aux_1_miou", "cam_aux_2_miou", "cls_f1_1", "cls_f1_2"):
        assert abs(a[key] - b[key]) < 5e-3, (key, a[key], b[key])


@pytest.mark.parametrize("input_mode", ["fixed", "native"])
def test_seg_evaluator_uint8_wire_same_scores(tiny_setup, input_mode):
    cfg, trainer, params = tiny_setup
    kw = dict(scales=(1.0, 1.5), merge="max", input_mode=input_mode)
    a = SegEvaluator(cfg, trainer.model, **kw).run(
        params, FakeSegDataset(with_sizes=True), batch_size=2, crf="none")
    b = SegEvaluator(cfg, trainer.model, **kw).run(
        params, _Uint8Wire(with_sizes=True), batch_size=2, crf="none")
    assert a["branch"] == b["branch"]
    for k in (1, 2):
        assert abs(a[f"seg_score_{k}"]["miou"]
                   - b[f"seg_score_{k}"]["miou"]) < 5e-3


def test_resolve_input_mode_guard(caplog):
    """tools/eval_seg.py UX guard (VERDICT r3 weak 5): VOC defaults to the
    reference's native-resolution protocol; forcing fixed on VOC warns."""
    import logging
    from dupl_tpu.engine.eval_seg import resolve_input_mode

    assert resolve_input_mode("voc", None) == "native"
    assert resolve_input_mode("coco", None) == "fixed"
    assert resolve_input_mode("coco", "native") == "native"

    log = logging.getLogger("guard-test")
    with caplog.at_level(logging.WARNING, logger="guard-test"):
        assert resolve_input_mode("voc", "fixed", log) == "fixed"
    assert any("not the reference protocol" in r.message
               for r in caplog.records)
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="guard-test"):
        assert resolve_input_mode("voc", "native", log) == "native"
    assert not caplog.records
