"""On-device GMM noise filter behaviour (reference: train_final_voc.py:358-394).

Bitwise sklearn parity is impossible (k-means init, tol early-exit); these tests
check the *statistical* contract: recovered components, gates, and the noise
masking rule."""

import numpy as np
import jax.numpy as jnp

from dupl_tpu.ops import gmm as gmm_ops


def test_fit_recovers_bimodal_components(rng):
    lo = rng.normal(0.3, 0.05, size=1500)
    hi = rng.normal(2.5, 0.2, size=500)
    x = np.concatenate([lo, hi]).astype(np.float32)[None]
    mask = np.ones_like(x, bool)
    fit = gmm_ops.fit_gmm2(jnp.asarray(x), jnp.asarray(mask))
    means = np.sort(np.asarray(fit.means)[0])
    assert abs(means[0] - 0.3) < 0.1
    assert abs(means[1] - 2.5) < 0.2
    assert float(fit.count[0]) == 2000


def test_filter_marks_high_loss_pixels(rng):
    h = w = 48
    label = np.ones((1, h, w), np.int32)
    loss = rng.normal(0.4, 0.05, size=(1, h, w)).astype(np.float32)
    noisy = np.zeros((h, w), bool)
    noisy[:10] = True  # 480 noisy pixels with high loss
    loss[0][noisy] = rng.normal(3.0, 0.2, size=noisy.sum())

    out = np.asarray(gmm_ops.gmm_filter_labels(jnp.asarray(loss), jnp.asarray(label)))
    assert (out[0][noisy] == 255).mean() > 0.95
    assert (out[0][~noisy] == 1).mean() > 0.95


def test_filter_respects_min_pixel_gate(rng):
    """< min_pixels above the floor -> no filtering at all."""
    h = w = 16  # 256 pixels < 1000
    label = np.ones((1, h, w), np.int32)
    loss = np.abs(rng.normal(2.0, 1.0, size=(1, h, w))).astype(np.float32)
    out = np.asarray(gmm_ops.gmm_filter_labels(jnp.asarray(loss), jnp.asarray(label)))
    np.testing.assert_array_equal(out, label)


def test_filter_respects_mean_gap_gate(rng):
    """Unimodal loss (|mu1-mu0| <= 1) -> no filtering."""
    h = w = 64
    label = np.ones((1, h, w), np.int32)
    loss = rng.normal(0.5, 0.05, size=(1, h, w)).astype(np.float32)
    out = np.asarray(gmm_ops.gmm_filter_labels(jnp.asarray(loss), jnp.asarray(label)))
    np.testing.assert_array_equal(out, label)


def test_background_pixels_never_marked(rng):
    h = w = 48
    label = np.ones((1, h, w), np.int32)
    label[0, :, :24] = 0  # left half background
    loss = rng.normal(0.4, 0.05, size=(1, h, w)).astype(np.float32)
    loss[0, :10, :] = rng.normal(3.0, 0.2, size=(10, w))
    out = np.asarray(gmm_ops.gmm_filter_labels(jnp.asarray(loss), jnp.asarray(label)))
    assert np.all(out[0][label[0] == 0] == 0)
