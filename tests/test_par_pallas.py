"""Pallas PAR kernel parity vs the XLA formulation (interpret mode on CPU;
the same kernel compiles natively on TPU)."""

import numpy as np
import jax.numpy as jnp

from dupl_tpu.ops import par as par_ops
from dupl_tpu.ops.par_pallas import propagate_pallas

DIL = (1, 2, 4, 8, 12, 24)


def test_pallas_propagate_matches_xla(rng):
    b, h, w, c = 2, 48, 48, 21
    masks = jnp.asarray(rng.rand(b, h, w, c).astype(np.float32))
    imgs = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    aff = par_ops.rgb_affinity(imgs, DIL)
    ref = par_ops.propagate(masks, aff, DIL, 3)
    out = propagate_pallas(masks, aff, DIL, 3, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_pallas_propagate_channel_padding(rng):
    """Channel counts that don't divide the tile still round-trip."""
    b, h, w, c = 1, 32, 32, 5
    masks = jnp.asarray(rng.rand(b, h, w, c).astype(np.float32))
    imgs = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    aff = par_ops.rgb_affinity(imgs, (1, 2))
    ref = par_ops.propagate(masks, aff, (1, 2), 2)
    out = propagate_pallas(masks, aff, (1, 2), 2, channel_tile=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_pallas_propagate_bf16_argmax_stable(rng):
    """The bf16 compute path (inference pipelines) stays within ~1% of the
    f32 propagation over 10 iterations, and on realistic *peaked* CAM-like
    posteriors the pseudo-label argmax it feeds is >=99.5% unchanged.
    (On adversarial near-uniform 21-class inputs — every pixel a near-tie —
    even rounding just the mask to bf16 between iterations flips ~1.5% of
    argmaxes; those labels are arbitrary coin-flips, not a kernel property.)"""
    import jax

    b, h, w, c = 2, 48, 48, 21
    # peaked posteriors: smooth region map with a dominant class per region
    region = (np.add.outer(np.arange(h) // 16, np.arange(w) // 16) % c)
    logits = rng.rand(b, h, w, c).astype(np.float32) * 2
    for bi in range(b):
        logits[bi, np.arange(h)[:, None], np.arange(w)[None, :], region] += 4.0
    masks = jnp.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    imgs = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    aff = par_ops.rgb_affinity(imgs, DIL)
    ref = np.asarray(par_ops.propagate(masks, aff, DIL, 10))
    out = np.asarray(propagate_pallas(masks, aff, DIL, 10,
                                      compute_dtype="bfloat16",
                                      interpret=True))
    err = np.abs(out - ref)
    assert np.quantile(err, 0.999) < 0.02, "bf16 PAR bulk error"
    assert err.max() < 0.08, f"bf16 PAR tail error {err.max():.4f}"
    agree = (out.argmax(-1) == ref.argmax(-1)).mean()
    assert agree > 0.995, f"bf16 PAR argmax agreement {agree:.4f}"


def test_affinity_pallas_matches_xla(rng):
    """The VMEM-resident affinity kernel must match ops.par.rgb_affinity
    (streaming std, channel-mean z², softmax + position term) exactly,
    including with row-band tiling (h > row_tile)."""
    from dupl_tpu.ops.par_pallas import affinity_pallas

    b, h, w = 2, 64, 48
    imgs = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    ref = par_ops.rgb_affinity(imgs, DIL)                       # (B, H, W, K)
    out = affinity_pallas(imgs, DIL, row_tile=32, interpret=True)  # (B,K,H,W)
    np.testing.assert_allclose(np.moveaxis(np.asarray(out), 1, -1),
                               np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_affinity_pallas_feeds_propagate(rng):
    """End-to-end kernel path (affinity bkhw -> propagate aff_layout) matches
    the XLA par_refine."""
    from dupl_tpu.ops.par_pallas import affinity_pallas

    b, h, w, c = 1, 32, 32, 7
    imgs = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    masks = jnp.asarray(rng.rand(b, h, w, c).astype(np.float32))
    ref = par_ops.par_refine(imgs, masks, DIL, num_iter=2, use_pallas=False)
    aff = affinity_pallas(imgs, DIL, row_tile=32, interpret=True)
    out = propagate_pallas(masks, aff, DIL, 2, interpret=True,
                           aff_layout="bkhw")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
