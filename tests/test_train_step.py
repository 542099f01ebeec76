"""Integration: every curriculum phase runs one jitted step end-to-end on the
tiny model and updates parameters (SURVEY.md §7 step 4: the minimum end-to-end
slice)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import dataclasses

from dupl_tpu.config import ModelConfig, TrainConfig, GmmConfig, ParConfig, voc_config
from dupl_tpu.data.pipeline import synthetic_batch
from dupl_tpu.engine.train import Trainer, TrainState, loss_weights, phase_of


@pytest.fixture(scope="module")
def tiny_trainer():
    cfg = voc_config(
        model=ModelConfig(backbone="test_tiny_patch16", compute_dtype="float32"),
        par=ParConfig(num_iter=2),
        gmm=GmmConfig(min_pixels=10),
        cam_iters=2, gmm_iters=4, max_iters=10,
        samples_per_device=2,
    )
    trainer = Trainer(cfg)
    batch = synthetic_batch(2, crop=64)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    state = trainer.init_state(jax.random.PRNGKey(0), batch["image"][:1])
    return cfg, trainer, state, batch


def test_phase_table():
    cfg = voc_config(cam_iters=2000, gmm_iters=8000, max_iters=20000)
    assert phase_of(cfg, 0) == "warmup"
    assert phase_of(cfg, 1999) == "warmup"
    assert phase_of(cfg, 2000) == "seg"
    assert phase_of(cfg, 7999) == "seg"
    assert phase_of(cfg, 8000) == "full"
    w = loss_weights(cfg, 100)
    assert w.seg == 0.0 and w.cls == 1.0 and w.ptc == 0.2
    w = loss_weights(cfg, 9000)
    assert w.reg == 0.05 and w.seg == 0.2


def test_coco_phase_table():
    from dupl_tpu.config import coco_config
    cfg = coco_config()
    assert phase_of(cfg, 100) == "warmup"
    assert phase_of(cfg, 9000) == "seg_static"
    assert phase_of(cfg, 13000) == "seg"
    assert phase_of(cfg, 40000) == "full"
    assert loss_weights(cfg, 100) == (1.0, 0.0, 0.0, 0.0, 0.0)
    assert loss_weights(cfg, 9000).seg == 0.2
    assert loss_weights(cfg, 9000).ptc == 0.0


def test_loss_weights_match_reference_tables():
    """Digit-for-digit parity with the reference's literal loss mixes:
    VOC train_final_voc.py:451-456, COCO train_final_coco.py:441-448.
    Steps are sampled strictly inside each phase (the documented 1-step
    ``<`` vs ``<=`` boundary shift is out of scope here, see PARITY.md)."""
    from dupl_tpu.config import coco_config
    voc = voc_config()
    # (step, cls, ptc, seg, sim, reg)
    voc_table = [
        (100,   1.0, 0.2, 0.0, 0.1, 0.0),    # n_iter <= cam_iters (2000)
        (5000,  1.0, 0.2, 0.2, 0.1, 0.0),    # <= gmm_iters (8000)
        (15000, 1.0, 0.2, 0.2, 0.1, 0.05),   # else
    ]
    for step, *w in voc_table:
        assert loss_weights(voc, step) == tuple(w), f"VOC step {step}"

    coco = coco_config()
    coco_table = [
        (100,   1.0, 0.0, 0.0, 0.0,  0.0),   # n_iter <= 8000
        (10000, 1.0, 0.0, 0.2, 0.05, 0.0),   # <= 12000
        (20000, 1.0, 0.2, 0.2, 0.05, 0.05),  # <= gmm_iters (32000)
        (50000, 1.0, 0.2, 0.2, 0.05, 0.05),  # else
    ]
    for step, *w in coco_table:
        assert loss_weights(coco, step) == tuple(w), f"COCO step {step}"


def test_all_phases_run_and_update(tiny_trainer):
    cfg, trainer, state, batch = tiny_trainer
    # host copies: the step functions donate the input state's buffers
    p0 = np.asarray(state.params["params"]["classifier"]["kernel"])
    pe0 = np.asarray(state.params["params"]["encoder"]["pos_embed"])

    for expected_phase in ["warmup", "warmup", "seg", "seg", "full"]:
        assert phase_of(cfg, int(state.step)) == expected_phase
        state, metrics = trainer.train_step(state, batch)
        for key in ("loss", "cls_loss", "ptc_loss", "seg_loss", "sim_loss", "reg_loss"):
            val = float(metrics[key])
            assert np.isfinite(val), (expected_phase, key, val)

    p1 = np.asarray(state.params["params"]["classifier"]["kernel"])
    assert not np.allclose(p0, p1)
    assert int(state.step) == 5
    # frozen pos_embed never moves
    np.testing.assert_array_equal(
        pe0, np.asarray(state.params["params"]["encoder"]["pos_embed"]))


def test_coco_recipe_phases_run():
    """COCO curriculum: warmup -> seg_static (aux CAM, static thresholds) ->
    seg (dynamic) all step and stay finite on the tiny model."""
    from dupl_tpu.config import coco_config
    cfg = coco_config(
        model=ModelConfig(backbone="test_tiny_patch16", num_classes=81,
                          aux_layer=2, compute_dtype="float32"),
        par=ParConfig(num_iter=1), gmm=GmmConfig(min_pixels=10),
        cam_iters=1, refine_switch_iters=2, gmm_iters=3, max_iters=10,
    )
    trainer = Trainer(cfg)
    batch = synthetic_batch(2, crop=64, num_fg=80)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    state = trainer.init_state(jax.random.PRNGKey(0), batch["image"][:1])
    for expected in ["warmup", "seg_static", "seg", "full"]:
        assert phase_of(cfg, int(state.step)) == expected
        state, metrics = trainer.train_step(state, batch)
        assert np.isfinite(float(metrics["loss"])), expected


def test_deterministic_given_seed(tiny_trainer):
    cfg, trainer, _, batch = tiny_trainer
    m = []
    for _ in range(2):
        state = trainer.init_state(jax.random.PRNGKey(7), batch["image"][:1])
        _, metrics = trainer.train_step(state, batch)
        m.append(float(metrics["loss"]))
    assert m[0] == m[1]


def test_cam_stream_dtype_agreement(tiny_trainer):
    """ModelConfig.cam_stream_dtype: a bf16-stream no-grad CAM pass must yield
    nearly the same min-max-normalised CAMs (and the same pseudo-labels almost
    everywhere) as the f32-stream pass it replaces in the production recipes."""
    from dupl_tpu.ops import cam as cam_ops

    cfg, trainer, _, batch = tiny_trainer
    # fresh params: the fixture state's buffers are donated by earlier steps
    state = trainer.init_state(jax.random.PRNGKey(3), batch["image"][:1])
    bf_cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, cam_stream_dtype="bfloat16"))
    bf_trainer = Trainer(bf_cfg)
    assert bf_trainer.cam_model is not bf_trainer.model
    assert trainer.cam_model is trainer.model  # None -> follows stream_dtype

    msc = jax.jit(lambda p, x: trainer._multi_scale_cams(p, x))
    msc_bf = jax.jit(lambda p, x: bf_trainer._multi_scale_cams(p, x))
    cams_a, _ = msc(state.params, batch["image"])
    cams_b, _ = msc_bf(state.params, batch["image"])
    # normalised CAMs live in [0, 1]
    assert float(jnp.max(jnp.abs(cams_a - cams_b))) < 0.05

    def labels(cams):
        _, lab = cam_ops.cam_to_label(
            cams[0], batch["cls_label"], bkg_thre=cfg.bkg_thre,
            high_thre=cfg.high_thre, low_thre=cfg.low_thre, ignore_mid=True,
            img_box=batch["img_box"], ignore_index=cfg.ignore_index)
        return lab

    agree = jnp.mean((labels(cams_a) == labels(cams_b)).astype(jnp.float32))
    assert float(agree) > 0.95


def test_cam_merge_downscale_agreement(tiny_trainer):
    """TrainConfig.cam_merge_downscale=2: merging training CAMs at the PAR
    input resolution must keep the refined pseudo-labels near-identical to the
    reference-exact full-resolution merge (every consumer downscales again)."""
    cfg, trainer, _, batch = tiny_trainer
    state = trainer.init_state(jax.random.PRNGKey(5), batch["image"][:1])
    small_trainer = Trainer(dataclasses.replace(cfg, cam_merge_downscale=2))

    from dupl_tpu.ops import image as image_ops
    denorm = image_ops.denormalize(batch["image"])

    def refined_labels(tr):
        cams, _ = jax.jit(lambda p, x: tr._multi_scale_cams(p, x))(
            state.params, batch["image"])
        return tr._refine(cams, denorm, batch["cls_label"], batch["img_box"],
                          high_thre=cfg.high_thre)

    full = refined_labels(trainer)
    small = refined_labels(small_trainer)
    assert full.shape == small.shape  # labels always at input resolution
    agree = jnp.mean((full == small).astype(jnp.float32))
    assert float(agree) > 0.95


def test_recipe_global_batch_derivation():
    """The recipe is defined by its GLOBAL batch (VOC 4 / COCO 8 —
    reference README.md:87,97: 2/GPU x 2 or 4 GPUs); tools/train.py derives
    the per-device batch from the mesh via resolve_samples_per_device so a
    1-chip run and a v5e-4 run train the same optimization recipe."""
    from dupl_tpu.config import coco_config, resolve_samples_per_device

    voc = voc_config()
    assert voc.global_batch == 4
    assert coco_config().global_batch == 8
    for n_data, want in ((1, 4), (2, 2), (4, 1)):
        got, warn = resolve_samples_per_device(voc, n_data)
        assert got.samples_per_device == want and warn is None
    # mesh larger than the recipe batch: floor at 1/device, warn
    got, warn = resolve_samples_per_device(voc, 8)
    assert got.samples_per_device == 1 and "8" in warn
    # explicit library configs opt out with global_batch=None
    got, warn = resolve_samples_per_device(
        dataclasses.replace(voc, global_batch=None), 1)
    assert got.samples_per_device == voc.samples_per_device and warn is None


def test_uint8_wire_format_step_parity(tiny_trainer):
    """The uint8 wire format (device-side normalize, ops/image.py
    prepare_inputs) trains the same as the reference's host-normalised f32
    format: the normalisation is the SAME (u8-mean)/std — float32 on device
    vs numpy's round-through-float64 on host, <=1 ulp apart; the [0,1]
    PAR/strong-aug view is exact u8/255 vs the f32 path's normalise/
    denormalise round-trip, so step metrics agree to fp tolerance."""
    from dupl_tpu.data.transforms import normalize_img
    from dupl_tpu.ops import image as image_ops

    cfg, trainer, state, batch = tiny_trainer
    rs = np.random.RandomState(3)
    u8 = (rs.rand(2, 64, 64, 3) * 255).astype(np.uint8)

    norm_dev, denorm_dev = jax.jit(image_ops.prepare_inputs)(jnp.asarray(u8))
    np.testing.assert_allclose(np.asarray(norm_dev), normalize_img(u8),
                               rtol=3e-7, atol=3e-7)  # <=1 ulp
    # XLA lowers /255 as *reciprocal(255): <=1 ulp vs the numpy division
    np.testing.assert_allclose(np.asarray(denorm_dev),
                               u8.astype(np.float32) / 255.0,
                               rtol=3e-7, atol=3e-7)

    b8 = dict(batch, image=jnp.asarray(u8))
    bf = dict(batch, image=jnp.asarray(normalize_img(u8)))
    # fresh state per call: step functions donate the input state's buffers
    state = trainer.init_state(jax.random.PRNGKey(0), batch["image"][:1])
    clone = lambda s: jax.tree.map(jnp.array, s)
    for step in (0, 5):  # warmup and full phases
        _, m8 = trainer.train_step(clone(state), b8, step=step)
        _, mf = trainer.train_step(clone(state), bf, step=step)
        for k in m8:
            np.testing.assert_allclose(
                np.asarray(m8[k]), np.asarray(mf[k]), rtol=2e-4, atol=2e-5,
                err_msg=f"metric {k} diverged between wire formats at step {step}")
