"""CRF tests: the device mean-field CRF against the native permutohedral
oracle (which implements the reference's pydensecrf algorithm,
utils/dcrf.py:42-68)."""

import numpy as np
import pytest
import jax.numpy as jnp

from dupl_tpu.ops import crf as crf_ops
from dupl_tpu.ops.crf_native import DenseCRF


def _synthetic_case(rs, h=96, w=96, c=3, flip_p=0.2):
    """Two-region color image with noisy unaries + ground truth."""
    img = np.zeros((h, w, 3), np.uint8)
    img[:, : w // 2] = [200, 30, 30]
    img[:, w // 2:] = [30, 30, 200]
    img = np.clip(img.astype(int) + rs.randint(-12, 12, img.shape), 0, 255).astype(np.uint8)
    gt = np.zeros((h, w), int)
    gt[:, w // 2:] = 1
    probs = np.full((c, h, w), 1e-3, np.float32)
    for l in range(2):
        probs[l][gt == l] = 0.6
    flip = rs.rand(h, w) < flip_p
    probs[0][flip & (gt == 0)] = 0.2
    probs[1][flip & (gt == 0)] = 0.7
    probs[1][flip & (gt == 1)] = 0.2
    probs[0][flip & (gt == 1)] = 0.7
    probs /= probs.sum(0, keepdims=True)
    return img, probs, gt


def test_native_crf_denoises(rng):
    img, probs, gt = _synthetic_case(rng)
    out = DenseCRF()(img, probs)
    assert (probs.argmax(0) == gt).mean() < 0.85
    assert (out.argmax(0) == gt).mean() > 0.99
    np.testing.assert_allclose(out.sum(0), 1.0, atol=1e-4)


def test_device_crf_matches_native_labels(rng):
    """The TPU mean-field CRF and the permutohedral oracle agree on the
    cleaned labels (the parity target is label/mIoU agreement, not
    marginals — SURVEY.md §7)."""
    img, probs, gt = _synthetic_case(rng)
    native = DenseCRF()(img, probs).argmax(0)

    device = crf_ops.mean_field_crf(
        jnp.asarray(img[None], jnp.float32) / 255.0,
        jnp.asarray(probs.transpose(1, 2, 0)[None]),
        downsample=8, row_chunk=8,
    )
    device = np.asarray(device)[0].argmax(-1)

    agree = (device == native).mean()
    assert agree > 0.98, agree
    assert (device == gt).mean() > 0.99


def test_device_crf_improves_noisy_labels(rng):
    img, probs, gt = _synthetic_case(rng, flip_p=0.3)
    before = (probs.argmax(0) == gt).mean()
    out = crf_ops.mean_field_crf(
        jnp.asarray(img[None], jnp.float32) / 255.0,
        jnp.asarray(probs.transpose(1, 2, 0)[None]),
        downsample=8, row_chunk=8,
    )
    after = (np.asarray(out)[0].argmax(-1) == gt).mean()
    assert after > before
    assert after > 0.99


def voc_scene(rs, h, w, n_classes=21, n_regions=12, flip_p=0.25, noise=12):
    """21-class Voronoi multi-region scene with per-region color, texture
    noise, low-frequency shading, and flipped unaries — the regime that
    stresses the pivot approximation (VERDICT r1 item 4: the two-region
    fixture said little about natural images)."""
    seeds_yx = rs.rand(n_regions, 2) * [h, w]
    seeds_cls = rs.randint(0, n_classes, n_regions)
    seeds_col = rs.randint(20, 236, (n_regions, 3))
    yy, xx = np.mgrid[0:h, 0:w]
    d = (yy[..., None] - seeds_yx[:, 0]) ** 2 + (xx[..., None] - seeds_yx[:, 1]) ** 2
    region = d.argmin(-1)
    gt = seeds_cls[region]
    img = seeds_col[region].astype(float)
    img += rs.randn(h, w, 3) * noise
    img += np.sin(yy / 9.0)[..., None] * 10 + np.cos(xx / 13.0)[..., None] * 10
    img = np.clip(img, 0, 255).astype(np.uint8)
    probs = np.full((n_classes, h, w), 0.4 / (n_classes - 1), np.float32)
    for c in range(n_classes):
        probs[c][gt == c] = 0.6
    flip = rs.rand(h, w) < flip_p
    wrong = rs.randint(0, n_classes, (h, w))
    for c in range(n_classes):
        m = flip & (wrong == c)
        probs[:, m] = 0.3 / (n_classes - 1)
        probs[c, m] = 0.7
    probs /= probs.sum(0, keepdims=True)
    return img, probs, gt


@pytest.mark.parametrize("size,noise,min_agree", [
    (224, 5, 0.97),    # light texture: near-lattice fidelity expected
    (224, 12, 0.95),   # heavy texture: moment-matched pivots must hold
    (448, 12, 0.96),   # the eval resolution (VOC protocol, crop 448)
])
def test_device_crf_vs_native_21class(rng, size, noise, min_agree):
    """Label agreement with the permutohedral oracle on 21-class textured
    scenes.  The round-1 cell-mean pivots scored 0.65-0.80 here; the
    moment-matched kernel must stay above ``min_agree``."""
    img, probs, gt = voc_scene(rng, size, size, noise=noise)
    native = DenseCRF()(img, probs).argmax(0)
    out = crf_ops.mean_field_crf(
        jnp.asarray(img[None], jnp.float32) / 255.0,
        jnp.asarray(probs.transpose(1, 2, 0)[None]),
        downsample=8, row_chunk=size // 8,
    )
    device = np.asarray(out)[0].argmax(-1)
    agree = (device == native).mean()
    assert agree > min_agree, f"device~native label agreement {agree:.4f}"
    # and the CRF must actually clean the unaries (the parity-relevant gain)
    assert (device == gt).mean() > (probs.argmax(0) == gt).mean() + 0.1


def _flipped_unaries(rs, gt, n_classes, flip_p=0.25):
    h, w = gt.shape
    probs = np.full((n_classes, h, w), 0.4 / (n_classes - 1), np.float32)
    for c in range(n_classes):
        probs[c][gt == c] = 0.6
    flip = rs.rand(h, w) < flip_p
    wrong = rs.randint(0, n_classes, (h, w))
    for c in range(n_classes):
        m = flip & (wrong == c)
        probs[:, m] = 0.3 / (n_classes - 1)
        probs[c, m] = 0.7
    return probs / probs.sum(0, keepdims=True)


@pytest.mark.parametrize("size,min_agree", [(224, 0.95), (448, 0.95)])
def test_device_crf_vs_native_photo_statistics(rng, size, min_agree):
    """Natural-image statistics arm (VERDICT r3 missing 5 / next 5): scenes
    with 1/f ("pink") spectra + a REAL JPEG encode/decode roundtrip
    (data/pipeline.py:photo_scene) instead of piecewise-constant blobs.  JPEG
    blocking/ringing and broadband texture perturb the bilateral kernel
    exactly as the reference's decoded VOC JPEGs do (utils/dcrf.py:42-68);
    the pivot moment-matching must hold label agreement with the
    permutohedral oracle there too."""
    from dupl_tpu.data.pipeline import photo_scene

    img, gt = photo_scene(rng, size, size, num_fg=20)
    probs = _flipped_unaries(rng, gt, 21)
    native = DenseCRF()(img, probs).argmax(0)
    out = crf_ops.mean_field_crf(
        jnp.asarray(img[None], jnp.float32) / 255.0,
        jnp.asarray(probs.transpose(1, 2, 0)[None]),
        downsample=8, row_chunk=size // 8,
    )
    device = np.asarray(out)[0].argmax(-1)
    agree = (device == native).mean()
    assert agree > min_agree, f"photo-stats device~native agreement {agree:.4f}"
    # the CRF must still clean the unaries under JPEG noise
    assert (device == gt).mean() > (probs.argmax(0) == gt).mean() + 0.05


def test_device_crf_batched_shapes(rng):
    b, h, w, c = 2, 64, 64, 4
    img = rng.rand(b, h, w, 3).astype(np.float32)
    logits = rng.rand(b, h, w, c).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    out = crf_ops.mean_field_crf(
        jnp.asarray(img), jnp.asarray(probs), downsample=8, row_chunk=8, iters=3)
    assert out.shape == (b, h, w, c)
    np.testing.assert_allclose(np.asarray(out).sum(-1), 1.0, atol=1e-4)



def test_device_crf_vs_native_81class(rng):
    """COCO-width class axis: fidelity must hold at 81 classes too (the COCO
    inference pipeline benches this configuration; reference COCO CRF params
    are identical to VOC's, tools/eval_seg_coco_ddp.py)."""
    img, probs, gt = voc_scene(rng, 224, 224, n_classes=81, n_regions=20,
                               noise=10)
    native = DenseCRF()(img, probs).argmax(0)
    out = crf_ops.mean_field_crf(
        jnp.asarray(img[None], jnp.float32) / 255.0,
        jnp.asarray(probs.transpose(1, 2, 0)[None]),
        downsample=8, row_chunk=28,
    )
    device = np.asarray(out)[0].argmax(-1)
    agree = (device == native).mean()
    assert agree > 0.95, f"81-class device~native agreement {agree:.4f}"
    # parity-relevant check: the device CRF's denoise gain must match the
    # permutohedral oracle's on the same scene (absolute gain is
    # scene-dependent at 81 classes)
    gain_device = (device == gt).mean() - (probs.argmax(0) == gt).mean()
    gain_native = (native == gt).mean() - (probs.argmax(0) == gt).mean()
    assert gain_device > 0, f"CRF must improve unaries (gain {gain_device:.4f})"
    assert gain_device > gain_native - 0.02, (gain_device, gain_native)
