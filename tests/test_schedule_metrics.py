"""Schedules (utils/optimizer.py, train_helper.cosine_descent) and metrics
(utils/evaluate.py) parity."""

import numpy as np
import pytest
import jax.numpy as jnp

from dupl_tpu.ops import schedule
from dupl_tpu.utils import metrics


def _ref_lr(step, lr=6e-5, warmup=1500, ratio=1e-6, max_iter=20000, power=0.9):
    if step < warmup:
        return lr * (1 - (1 - step / warmup) * (1 - ratio))
    if step < max_iter:
        return lr * (1 - step / max_iter) ** power
    return 0.0


def test_poly_warmup_schedule():
    for step in [0, 1, 750, 1499, 1500, 5000, 19999]:
        ours = float(schedule.poly_warmup_schedule(
            step, base_lr=6e-5, warmup_iters=1500, warmup_ratio=1e-6,
            max_iters=20000, power=0.9))
        # rel 5e-4 absorbs f32 cancellation in (1 - t/T) at the schedule tail
        assert ours == pytest.approx(_ref_lr(step), rel=5e-4)


def test_cosine_descent():
    start = np.full(20, 0.7, np.float32)
    target = np.array([0.70] * 4 + [0.55] * 16, np.float32)
    n = 18000
    for step in [-5, 0, 1, 9000, 17999, 18000, 25000]:
        ours = np.asarray(schedule.cosine_descent(start, target, step, n))
        if step < 0:
            expect = start
        elif step >= n:
            expect = target
        else:
            t = step / (n - 1)
            expect = start + (target - start) * (1 - np.cos(np.pi * t)) / 2
        np.testing.assert_allclose(ours, expect, rtol=1e-5)


def test_per_sample_high_thre():
    thres = jnp.asarray(np.linspace(0.5, 0.7, 20).astype(np.float32))
    cls = np.zeros((2, 20), np.float32)
    cls[0, [0, 19]] = 1
    cls[1, [3]] = 1
    out = np.asarray(schedule.per_sample_high_thre(thres, jnp.asarray(cls)))
    assert out[0] == pytest.approx(float(thres[19]))
    assert out[1] == pytest.approx(float(thres[3]))


def test_fast_hist_and_scores(rng):
    gt = rng.randint(0, 21, size=(4, 32, 32)).astype(np.int32)
    gt[0, :4] = 255  # ignored pixels fall outside [0, C)
    pred = rng.randint(0, 21, size=(4, 32, 32)).astype(np.int32)

    hist_dev = np.asarray(metrics.fast_hist(jnp.asarray(gt), jnp.asarray(pred), 21))

    mask = (gt >= 0) & (gt < 21)
    hist_ref = np.bincount(
        21 * gt[mask].astype(int) + pred[mask], minlength=21 * 21
    ).reshape(21, 21)
    np.testing.assert_array_equal(hist_dev, hist_ref)

    s_dev = metrics.scores_from_hist(hist_dev)
    s_ref = metrics.scores(list(gt), list(pred))
    assert s_dev["miou"] == pytest.approx(s_ref["miou"], rel=1e-9)
    assert s_dev["pAcc"] == pytest.approx(s_ref["pAcc"], rel=1e-9)


def test_multilabel_f1(rng):
    import sklearn.metrics as skm
    y = (rng.rand(20) > 0.7).astype(int)
    p = (rng.rand(20) > 0.7).astype(int)
    assert metrics.multilabel_f1(y, p) == pytest.approx(skm.f1_score(y, p))


def test_cam_overlay_grid_resolutions(rng):
    """TB CAM overlays must accept CAMs at a coarser grid than the images
    (cam_merge_downscale merges training CAMs at input/2) as well as full
    resolution, and upsample to the image grid."""
    from dupl_tpu.utils.tb import cam_overlay_grid, image_grid

    img = rng.rand(4, 64, 64, 3).astype(np.float32)
    for ch in (32, 64):
        cams = rng.rand(4, ch, ch, 5).astype(np.float32)
        g = cam_overlay_grid(img, cams, nrow=2)
        assert g.shape == (128, 128, 3) and g.dtype == np.uint8
    assert image_grid(img, nrow=2).shape == (128, 128, 3)
