"""Fast (pivot-lattice) CRF mode agrees with the full mode and the native
oracle on cleaned labels."""

import numpy as np
import jax.numpy as jnp

from dupl_tpu.ops import crf as crf_ops
from tests.test_crf import _synthetic_case


def test_fast_mode_label_agreement(rng):
    img, probs, gt = _synthetic_case(rng)
    args = (jnp.asarray(img[None], jnp.float32) / 255.0,
            jnp.asarray(probs.transpose(1, 2, 0)[None]))
    full = np.asarray(crf_ops.mean_field_crf(
        *args, downsample=8, row_chunk=8))[0].argmax(-1)
    fast = np.asarray(crf_ops.mean_field_crf(
        *args, downsample=8, row_chunk=8, fast=True))[0].argmax(-1)
    assert (full == fast).mean() > 0.98
    assert (fast == gt).mean() > 0.99


def test_fast_mode_21class_448(rng):
    """The mode bench.py actually measures, at the eval resolution, on the
    hard 21-class textured fixture: fast must track the full mode and still
    clean the unaries (VERDICT r1 item 4 — bound fidelity in tests)."""
    from tests.test_crf import voc_scene

    img, probs, gt = voc_scene(rng, 448, 448, noise=12)
    args = (jnp.asarray(img[None], jnp.float32) / 255.0,
            jnp.asarray(probs.transpose(1, 2, 0)[None]))
    full = np.asarray(crf_ops.mean_field_crf(
        *args, downsample=8, row_chunk=56))[0].argmax(-1)
    fast = np.asarray(crf_ops.mean_field_crf(
        *args, downsample=8, row_chunk=56, fast=True))[0].argmax(-1)
    assert (full == fast).mean() > 0.95
    assert (fast == gt).mean() > (probs.argmax(0) == gt).mean() + 0.1


def test_return_logits_same_labels(rng):
    """``return_logits=True`` must give identical argmax labels (softmax is
    monotone per pixel)."""
    b, h, w, c = 1, 64, 64, 5
    img = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    logits = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    probs = jnp.exp(logits) / jnp.exp(logits).sum(-1, keepdims=True)
    kw = dict(downsample=8, row_chunk=8, iters=3, fast=True)
    marg = np.asarray(crf_ops.mean_field_crf(img, probs, **kw))
    lg = np.asarray(crf_ops.mean_field_crf(img, probs, return_logits=True, **kw))
    np.testing.assert_array_equal(marg.argmax(-1), lg.argmax(-1))
