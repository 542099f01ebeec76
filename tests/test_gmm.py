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


def test_fit_matches_sklearn_overlapping(rng):
    """Weak-bimodality regime: two components whose supports overlap
    substantially (means 0.6 / 1.6, sigmas 0.25 / 0.45).  A shared-variance
    kmeans init under-separates here — the responsibilities start
    near-uniform and the means collapse toward each other — while sklearn's
    init (a full M step on the hard assignment: per-cluster variances AND
    mixing weights, sklearn/mixture/_gaussian_mixture.py) keeps them apart.
    fit_gmm2 mirrors that init; this pins the recovered parameters to
    sklearn's on the same draw."""
    from sklearn.mixture import GaussianMixture

    lo = rng.normal(0.6, 0.25, size=1400)
    hi = rng.normal(1.6, 0.45, size=600)
    x = np.abs(np.concatenate([lo, hi])).astype(np.float32)[None]
    mask = np.ones_like(x, bool)

    fit = gmm_ops.fit_gmm2(jnp.asarray(x), jnp.asarray(mask))
    means = np.sort(np.asarray(fit.means)[0])
    weights = np.asarray(fit.weights)[0][np.argsort(np.asarray(fit.means)[0])]

    sk = GaussianMixture(n_components=2, max_iter=10, tol=1e-2,
                         reg_covar=5e-4, random_state=0).fit(x[0, :, None])
    sk_order = np.argsort(sk.means_[:, 0])
    sk_means = sk.means_[sk_order, 0]
    sk_weights = sk.weights_[sk_order]

    assert np.abs(means - sk_means).max() < 0.12, (means, sk_means)
    assert np.abs(weights - sk_weights).max() < 0.08, (weights, sk_weights)


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


def _sklearn_filter(loss, label, *, valid_thre=1.0, gamma=0.95, ignore_index=255):
    """The reference's exact host loop (train_final_voc.py:366-394) with
    sklearn.mixture.GaussianMixture."""
    from sklearn.mixture import GaussianMixture

    out = label.copy()
    b, h, w = loss.shape
    for i in range(b):
        roi = (label[i] != 0) & (label[i] != ignore_index)
        m = loss[i][roi]
        if (m > 0.1).sum() <= 1000:
            continue
        gmm = GaussianMixture(n_components=2, max_iter=10, tol=1e-2,
                              reg_covar=5e-4, random_state=0)
        gmm.fit(m[m > 0.1].reshape(-1, 1))
        if abs(gmm.means_[0, 0] - gmm.means_[1, 0]) <= valid_thre:
            continue
        noise_idx = gmm.means_.argmax()
        prob = gmm.predict_proba(loss[i].reshape(-1, 1))
        noise = (prob[:, noise_idx] > gamma).reshape(h, w) & (label[i] != 0)
        out[i][noise] = ignore_index
    return out


def test_agreement_with_sklearn_reference(rng):
    """Direct noise-mask agreement vs the sklearn pipeline the reference runs,
    across regimes: bimodal (filters), unimodal (gated off), small-count
    (gated off), mixed batch (VERDICT r1 item 6).  IoU of newly-masked pixels
    > 0.9 in the filtering regime; exact agreement in the gated regimes."""
    h = w = 56
    b = 4
    label = np.ones((b, h, w), np.int32)
    label[:, :, :8] = 0          # background strip
    label[:, :4, :] = 255        # ignore strip
    loss = rng.gamma(2.0, 0.15, size=(b, h, w)).astype(np.float32)

    # image 0: clearly bimodal — a noisy blob with separated high loss
    loss[0, 20:40, 20:52] = rng.normal(2.8, 0.25, size=(20, 32))
    # image 1: unimodal (mean gap below the gate) — must be untouched
    # (the base gamma draw already is)
    # image 2: bimodal but with only a few high-loss pixels (count still >1000
    # above the floor because gamma(2, .15) has a long tail? make it explicit)
    loss[2] = rng.normal(0.05, 0.02, size=(h, w)).astype(np.float32)
    loss[2, :10, :20] = rng.normal(2.0, 0.1, size=(10, 20))  # 200 px > 0.1 -> gated
    # image 3: bimodal with a different geometry
    loss[3, 30:56, :28] = rng.normal(3.5, 0.3, size=(26, 28))
    loss = np.abs(loss)

    ours = np.asarray(gmm_ops.gmm_filter_labels(jnp.asarray(loss), jnp.asarray(label)))
    ref = _sklearn_filter(loss, label)

    for i in (1, 2):
        np.testing.assert_array_equal(ours[i], label[i],
                                      err_msg=f"gated image {i} was filtered")
        np.testing.assert_array_equal(ref[i], label[i])

    for i in (0, 3):
        new_ours = (ours[i] == 255) & (label[i] != 255)
        new_ref = (ref[i] == 255) & (label[i] != 255)
        assert new_ref.sum() > 100, "sklearn reference found no noise — bad fixture"
        inter = (new_ours & new_ref).sum()
        union = (new_ours | new_ref).sum()
        assert inter / union > 0.9, (
            f"image {i}: noise-mask IoU vs sklearn {inter / union:.3f}")


def test_background_pixels_never_marked(rng):
    h = w = 48
    label = np.ones((1, h, w), np.int32)
    label[0, :, :24] = 0  # left half background
    loss = rng.normal(0.4, 0.05, size=(1, h, w)).astype(np.float32)
    loss[0, :10, :] = rng.normal(3.0, 0.2, size=(10, w))
    out = np.asarray(gmm_ops.gmm_filter_labels(jnp.asarray(loss), jnp.asarray(label)))
    assert np.all(out[0][label[0] == 0] == 0)
