"""Offline-eval protocol co-run vs the torch reference (VERDICT r2 item 4).

Mirrors the reference's own eval drivers step-for-step on the reference's
``siamese_network`` + ``evaluate.scores`` —

* VOC: tools/eval_seg_voc.py:38-91 ``_validate`` (native-resolution input,
  per-scale seg resized to the label size, flip-SUM then scale-MAX merge,
  argmax) + :94-153 ``crf_proc`` (logits -> softmax -> DenseCRF -> argmax)
  with the branch pick of :185-188;
* COCO: tools/eval_seg_coco_ddp.py:77-135 (fixed-size input, scale-1.0 seg
  kept at decoder resolution, other scales resized DOWN to it, flip-sum then
  scale-SUM merge, one resize to the label) + the strided shard split of
  :240-242 —

and compares against :class:`SegEvaluator` end-to-end on identical weights
and a synthetic dataset: per-branch raw mIoU, the branch pick, and the
CRF-output labels.  Both sides use the repo's C++ permutohedral DenseCRF
(pydensecrf's algorithm; its fidelity to pydensecrf is covered by
tests/test_crf_native.py) so this test isolates the *protocol wiring* —
merge order/resolution, resize placement, softmax axis, scoring, shard
split — which is exactly what has many small knobs.
"""

import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import ref_oracle

torch = pytest.importorskip("torch")

pytestmark = [
    pytest.mark.skipif(
        not os.path.isdir(ref_oracle.REFERENCE_ROOT),
        reason="reference not present"),
    pytest.mark.slow,
]

TINY_BACKBONE = "deit_tiny_patch16_224"
TINY_JAX = "deit_tiny_patch16"


@pytest.fixture(scope="module")
def R():
    return ref_oracle.load_reference()


def make_pair(R, num_classes=21, seed=0):
    from dupl_tpu.config import ModelConfig
    from dupl_tpu.models.network import DualStudent

    torch.manual_seed(seed)
    np.random.seed(seed)
    net = R.model_dupl.siamese_network(
        TINY_BACKBONE, num_classes=num_classes, pretrained=False,
        aux_layer=-3)
    net.eval()
    params = ref_oracle.convert_siamese_state(net)
    cfg = ModelConfig(backbone=TINY_JAX, num_classes=num_classes,
                      aux_layer=-3, compute_dtype="float32")
    return net, DualStudent(cfg), params


class BlobSegDataset:
    """Piecewise-constant color blobs with structured labels (+ a 255 ring)
    so the CRF has real edges to snap to.  Deterministic per index."""

    def __init__(self, n=4, num_classes=21, seed=0,
                 sizes=((64, 80), (80, 64), (96, 96), (64, 64))):
        self.n, self.nc, self.seed = n, num_classes, seed
        self.sizes = sizes

    def __len__(self):
        return self.n

    def image_size(self, i):
        return self.sizes[i % len(self.sizes)]

    def __getitem__(self, i, seed=None):
        from dupl_tpu.data.transforms import normalize_img

        rs = np.random.RandomState(self.seed * 997 + i)
        h, w = self.sizes[i % len(self.sizes)]
        raw = np.full((h, w, 3), rs.randint(0, 255, 3), np.uint8)
        label = np.zeros((h, w), np.int32)
        for _ in range(3):
            cls = rs.randint(1, self.nc)
            y0, x0 = rs.randint(0, h // 2), rs.randint(0, w // 2)
            y1, x1 = y0 + rs.randint(h // 4, h // 2), x0 + rs.randint(w // 4, w // 2)
            color = rs.randint(0, 255, 3)
            raw[y0:y1, x0:x1] = color
            label[y0:y1, x0:x1] = cls
            # ignore ring around the blob boundary, like VOC's void band
            label[max(0, y0 - 1):y0 + 1, x0:x1] = 255
        raw = np.clip(raw.astype(np.int16) + rs.randint(-8, 8, raw.shape),
                      0, 255).astype(np.uint8)
        cls_label = np.zeros(self.nc - 1, np.float32)
        present = np.unique(label)
        for c in present:
            if 0 < c < 255:
                cls_label[c - 1] = 1
        return {"name": f"img{i:02d}", "image": normalize_img(raw),
                "raw_image": raw, "label": label, "cls_label": cls_label}


# ---------------------------------------------------------------------------
# torch-side protocol mirrors
# ---------------------------------------------------------------------------

def _torch_validate_voc(R, net, samples, scales):
    """tools/eval_seg_voc.py:38-91, faithfully: native input, per-scale seg
    resized to the LABEL size, flip-sum, max over scales, argmax int16."""
    import torch.nn.functional as F

    gts, preds = [], {1: [], 2: []}
    msc = {1: [], 2: []}
    with torch.no_grad():
        for s in samples:
            inputs = ref_oracle.nchw(s["image"][None])
            labels = torch.tensor(s["label"][None])
            h, w = inputs.shape[2:]
            seg_list = {1: [], 2: []}
            for sc in scales:
                _h, _w = int(h * sc), int(w * sc)
                _inputs = F.interpolate(inputs, size=[_h, _w], mode="bilinear",
                                        align_corners=False)
                cat = torch.cat([_inputs, _inputs.flip(-1)], dim=0)
                res = net(cat)
                for k in (1, 2):
                    segs = res[f"branch{k}"][1]
                    segs = F.interpolate(segs, size=labels.shape[1:],
                                         mode="bilinear", align_corners=False)
                    seg_list[k].append(segs[:1] + segs[1:].flip(-1))
            for k in (1, 2):
                seg = torch.max(torch.stack(seg_list[k], dim=0), dim=0)[0]
                msc[k].append(seg.numpy())
                preds[k] += list(torch.argmax(seg, dim=1).numpy().astype(np.int16))
            gts += list(labels.numpy().astype(np.int16))
    s1 = R.evaluate.scores(gts, preds[1])
    s2 = R.evaluate.scores(gts, preds[2])
    return s1, s2, msc


def _torch_validate_coco(R, net, samples, scales, size, nc):
    """tools/eval_seg_coco_ddp.py:77-135: input resized to the fixed eval
    size, scale-1.0 seg kept at decoder resolution, other scales' segs
    resized DOWN to it, flip-sum + scale-sum merge, one resize to the
    label."""
    import torch.nn.functional as F

    gts, preds = [], {1: [], 2: []}
    msc = {1: [], 2: []}
    with torch.no_grad():
        for s in samples:
            inputs = ref_oracle.nchw(s["image"][None])
            labels = torch.tensor(s["label"][None])
            inputs = F.interpolate(inputs, size=[size, size], mode="bilinear",
                                   align_corners=False)
            h, w = inputs.shape[2:]
            cat = torch.cat([inputs, inputs.flip(-1)], dim=0)
            res = net(cat)
            seg_list, hs = {1: [], 2: []}, None
            for k in (1, 2):
                segs = res[f"branch{k}"][1]
                seg_list[k].append(segs[:1] + segs[1:].flip(-1))
            hs, ws = seg_list[1][0].shape[2:]
            for sc in scales:
                if sc == 1.0:
                    continue
                _h, _w = int(h * sc), int(w * sc)
                _inputs = F.interpolate(inputs, size=[_h, _w], mode="bilinear",
                                        align_corners=False)
                cat = torch.cat([_inputs, _inputs.flip(-1)], dim=0)
                res = net(cat)
                for k in (1, 2):
                    segs = res[f"branch{k}"][1]
                    segs = F.interpolate(segs, size=(hs, ws), mode="bilinear",
                                         align_corners=False)
                    seg_list[k].append(segs[:1] + segs[1:].flip(-1))
            for k in (1, 2):
                seg = torch.sum(torch.stack(seg_list[k], dim=0), dim=0)
                msc[k].append(seg.numpy())
                up = F.interpolate(seg, size=labels.shape[1:], mode="bilinear",
                                   align_corners=False)
                preds[k] += list(torch.argmax(up, dim=1).numpy().astype(np.int16))
            gts += list(labels.numpy().astype(np.int16))
    s1 = R.evaluate.scores(gts, preds[1], num_classes=nc)
    s2 = R.evaluate.scores(gts, preds[2], num_classes=nc)
    return s1, s2, msc


def _torch_crf_proc(samples, msc_logits, crf_cfg):
    """tools/eval_seg_voc.py:94-153 / eval_seg_coco_ddp.py:150-209: per image
    resize the saved msc logits to the image size, softmax, DenseCRF,
    argmax."""
    import torch.nn.functional as F
    from dupl_tpu.ops.crf_native import DenseCRF

    post = DenseCRF.from_config(crf_cfg)
    out = {}
    for s, logit in zip(samples, msc_logits):
        H, W = s["raw_image"].shape[:2]
        lg = F.interpolate(torch.FloatTensor(logit), size=(H, W),
                           mode="bilinear", align_corners=False)
        prob = torch.softmax(lg, dim=1)[0].numpy()
        prob = post(s["raw_image"], prob)
        out[s["name"]] = np.argmax(prob, axis=0).astype(np.uint8)
    return out


# ---------------------------------------------------------------------------
# the co-runs
# ---------------------------------------------------------------------------

def test_voc_offline_eval_protocol_corun(tmp_path):
    from dupl_tpu.config import DataConfig, ModelConfig, voc_config
    from dupl_tpu.engine.eval_seg import SegEvaluator

    R = ref_oracle.load_reference()
    net, model, params = make_pair(R, num_classes=21, seed=5)
    ds = BlobSegDataset(n=4, num_classes=21, seed=3)
    samples = [ds[i] for i in range(len(ds))]
    scales = (1.0, 1.5, 1.25)

    t1, t2, msc = _torch_validate_voc(R, net, samples, scales)
    t_best = 1 if t1["miou"] > t2["miou"] else 2
    t_crf = _torch_crf_proc(samples, msc[t_best],
                            voc_config().crf)

    cfg = voc_config(model=ModelConfig(backbone=TINY_JAX,
                                       compute_dtype="float32"),
                     data=DataConfig(crop_size=64))
    ev = SegEvaluator(cfg, model, scales=scales, merge="max",
                      input_mode="native")
    res = ev.run(params, ds, batch_size=1, crf="native",
                 out_dir=str(tmp_path))

    assert abs(res["seg_score_1"]["miou"] - t1["miou"]) < 1e-3
    assert abs(res["seg_score_2"]["miou"] - t2["miou"]) < 1e-3
    assert res["branch"] == t_best

    from PIL import Image
    agree = total = 0
    for s in samples:
        pred = np.asarray(Image.open(
            tmp_path / "seg_preds" / (s["name"] + ".png")))
        agree += (pred == t_crf[s["name"]]).sum()
        total += pred.size
    assert agree / total >= 0.995, f"CRF label agreement {agree / total:.4f}"


def test_intraining_validator_protocol_corun(monkeypatch):
    """In-training validator co-run (VERDICT r3 item 2): the repo's
    :class:`Validator` vs the reference's own ``validate_siamase``
    (utils/train_helper.py:90-185) on identical weights and the same
    synthetic seg set — CAM mIoU, aux-CAM mIoU, seg mIoU per branch and the
    per-image cls F1, at the offline co-runs' tolerances.

    The reference function runs VERBATIM (its .cuda() pinned to host via
    monkeypatch; torchvision/texttable import shims in ref_oracle)."""
    import types as _types

    from dupl_tpu.config import DataConfig, ModelConfig, voc_config
    from dupl_tpu.engine.validate import Validator

    R = ref_oracle.load_reference()
    th = ref_oracle.load_train_helper()
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)

    net, model, params = make_pair(R, num_classes=21, seed=7)
    cfg = voc_config(model=ModelConfig(backbone=TINY_JAX,
                                       compute_dtype="float32"),
                     data=DataConfig(crop_size=64))
    ds = BlobSegDataset(n=4, num_classes=21, seed=12)
    samples = [ds[i] for i in range(len(ds))]

    # the reference's val loader protocol: batch-1 (name, img, label, cls)
    loader = [(s["name"], ref_oracle.nchw(s["image"][None]),
               torch.tensor(s["label"][None].astype(np.int64)),
               torch.tensor(s["cls_label"][None]))
              for s in samples]
    args = _types.SimpleNamespace(
        crop_size=cfg.data.crop_size, cam_scales=cfg.cam_scales,
        bkg_thre=cfg.bkg_thre, high_thre=cfg.high_thre,
        low_thre=cfg.low_thre, ignore_index=255)
    # Capture the six score dicts validate_siamase hands to format_tabs
    # (its own return value averages per-class IoU with a plain mean, which
    # is NaN on a tiny set where some of the 21 classes never occur; the
    # 'miou' key inside the dicts is the nanmean the logs report).
    captured = {}
    real_format_tabs = th.format_tabs

    def spy_format_tabs(scores, name_list, cat_list=None, return_item=False):
        captured["scores"] = scores
        return real_format_tabs(scores, name_list, cat_list=cat_list,
                                return_item=return_item)

    monkeypatch.setattr(th, "format_tabs", spy_format_tabs)
    f1_1, f1_2, _, _ = th.validate_siamase(
        model=net, data_loader=loader, args=args, return_item=True)
    t_cam1, t_aux1, t_seg1, t_cam2, t_aux2, t_seg2 = [
        s["miou"] for s in captured["scores"]]

    res = Validator(cfg, model).run(params, ds, batch_size=2)

    for key, want in [("cam_1_miou", t_cam1), ("cam_aux_1_miou", t_aux1),
                      ("seg_1_miou", t_seg1), ("cam_2_miou", t_cam2),
                      ("cam_aux_2_miou", t_aux2), ("seg_2_miou", t_seg2)]:
        assert abs(res[key] - want) < 1e-3, (key, res[key], want)
    assert abs(res["cls_f1_1"] - f1_1) < 1e-6
    assert abs(res["cls_f1_2"] - f1_2) < 1e-6


def test_coco_offline_eval_protocol_corun(tmp_path):
    """COCO sum-merge at decoder resolution + the strided DDP shard split
    (eval_seg_coco_ddp.py:120-121, 240-242)."""
    from dupl_tpu.config import DataConfig, ModelConfig, coco_config
    from dupl_tpu.engine.eval_seg import SegEvaluator

    R = ref_oracle.load_reference()
    nc, size = 81, 64
    net, model, params = make_pair(R, num_classes=nc, seed=6)
    ds = BlobSegDataset(n=4, num_classes=nc, seed=9)
    samples = [ds[i] for i in range(len(ds))]
    scales = (1.0, 1.25, 1.5)

    cfg = coco_config(model=ModelConfig(backbone=TINY_JAX, num_classes=nc,
                                        compute_dtype="float32"),
                      data=DataConfig(crop_size=size))
    ev = SegEvaluator(cfg, model, scales=scales, merge="sum",
                      input_mode="fixed", merge_at="decoder")

    # per-shard raw scores, like each DDP rank on its strided subset
    for shard in (0, 1):
        sub = samples[shard::2]
        t1, t2, msc = _torch_validate_coco(R, net, sub, scales, size, nc)
        res = ev.run(params, ds, batch_size=2, crf="none",
                     shard=shard, num_shards=2)
        assert abs(res["seg_score_1"]["miou"] - t1["miou"]) < 1e-3, shard
        assert abs(res["seg_score_2"]["miou"] - t2["miou"]) < 1e-3, shard
        assert res["branch"] == (1 if t1["miou"] > t2["miou"] else 2)

    # full-set CRF pass on the picked branch
    t1, t2, msc = _torch_validate_coco(R, net, samples, scales, size, nc)
    t_best = 1 if t1["miou"] > t2["miou"] else 2
    t_crf = _torch_crf_proc(samples, msc[t_best], cfg.crf)
    res = ev.run(params, ds, batch_size=2, crf="native",
                 out_dir=str(tmp_path))

    from PIL import Image
    agree = total = 0
    for s in samples:
        pred = np.asarray(Image.open(
            tmp_path / "seg_preds" / (s["name"] + ".png")))
        agree += (pred == t_crf[s["name"]]).sum()
        total += pred.size
    assert agree / total >= 0.995, f"CRF label agreement {agree / total:.4f}"


def test_coco_intraining_validator_protocol_corun(monkeypatch):
    """COCO in-training validator co-run: :class:`Validator` at 81 classes vs
    the reference's own ``validate_siamase_coco``
    (utils/train_helper.py:188-283) on identical weights and the same
    synthetic seg set.  The COCO variant differs from VOC only in class
    count/list and per-branch interleaved accumulation — this pins the repo's
    single implementation to BOTH reference functions (the VOC twin is
    test_intraining_validator_protocol_corun)."""
    import types as _types

    from dupl_tpu.config import DataConfig, ModelConfig, coco_config
    from dupl_tpu.engine.validate import Validator

    R = ref_oracle.load_reference()
    th = ref_oracle.load_train_helper()
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)

    nc = 81
    net, model, params = make_pair(R, num_classes=nc, seed=8)
    cfg = coco_config(model=ModelConfig(backbone=TINY_JAX, num_classes=nc,
                                        aux_layer=-3,
                                        compute_dtype="float32"),
                      data=DataConfig(crop_size=64))
    ds = BlobSegDataset(n=4, num_classes=nc, seed=14)
    samples = [ds[i] for i in range(len(ds))]

    loader = [(s["name"], ref_oracle.nchw(s["image"][None]),
               torch.tensor(s["label"][None].astype(np.int64)),
               torch.tensor(s["cls_label"][None]))
              for s in samples]
    args = _types.SimpleNamespace(
        crop_size=cfg.data.crop_size, cam_scales=cfg.cam_scales,
        bkg_thre=cfg.bkg_thre, high_thre=cfg.high_thre,
        low_thre=cfg.low_thre, ignore_index=255)
    captured = {}
    real_format_tabs = th.format_tabs

    def spy_format_tabs(scores, name_list, cat_list=None, return_item=False):
        captured["scores"] = scores
        return real_format_tabs(scores, name_list, cat_list=cat_list,
                                return_item=return_item)

    monkeypatch.setattr(th, "format_tabs", spy_format_tabs)
    f1_1, f1_2, _, _ = th.validate_siamase_coco(
        model=net, data_loader=loader, args=args, return_item=True)
    t_cam1, t_aux1, t_seg1, t_cam2, t_aux2, t_seg2 = [
        s["miou"] for s in captured["scores"]]

    res = Validator(cfg, model).run(params, ds, batch_size=2)

    for key, want in [("cam_1_miou", t_cam1), ("cam_aux_1_miou", t_aux1),
                      ("seg_1_miou", t_seg1), ("cam_2_miou", t_cam2),
                      ("cam_aux_2_miou", t_aux2), ("seg_2_miou", t_seg2)]:
        assert abs(res[key] - want) < 1e-3, (key, res[key], want)
    assert abs(res["cls_f1_1"] - f1_1) < 1e-6
    assert abs(res["cls_f1_2"] - f1_2) < 1e-6
