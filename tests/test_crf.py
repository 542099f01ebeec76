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


def test_device_crf_batched_shapes(rng):
    b, h, w, c = 2, 64, 64, 4
    img = rng.rand(b, h, w, 3).astype(np.float32)
    logits = rng.rand(b, h, w, c).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    out = crf_ops.mean_field_crf(
        jnp.asarray(img), jnp.asarray(probs), downsample=8, row_chunk=8, iters=3)
    assert out.shape == (b, h, w, c)
    np.testing.assert_allclose(np.asarray(out).sum(-1), 1.0, atol=1e-4)
