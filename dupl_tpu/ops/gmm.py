"""On-device per-image GMM noise filtering.

The reference fits a sklearn ``GaussianMixture(n_components=2, max_iter=10,
tol=1e-2, reg_covar=5e-4)`` per image and branch on the foreground CE-loss
values, on the host, forcing a device->CPU sync every step
(train_final_voc.py:358-394).  Here the same 1-D 2-component EM runs as
batched, masked, fixed-iteration device code: the ``> 1000 pixels`` and
``|μ1 - μ0| > thre`` gates become ``where`` masks instead of Python branches.

Exact bitwise parity with sklearn is impossible (k-means init, early tol exit);
the parity target is the filtering *behaviour* — which pixels get marked noisy
— and ultimately final mIoU (SURVEY.md §7 "GMM control flow").
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class GmmFit(NamedTuple):
    means: jax.Array    # (..., 2)
    var: jax.Array      # (..., 2)
    weights: jax.Array  # (..., 2) mixing proportions
    count: jax.Array    # (...,) number of fitted points


def _weighted_kmeans_init(x, w, iters: int = 8):
    """Deterministic 1-D 2-means on weighted points, seeded at the weighted
    min/max — a stand-in for sklearn's k-means init."""
    big = 1e30
    lo = jnp.min(jnp.where(w > 0, x, big), axis=-1)
    hi = jnp.max(jnp.where(w > 0, x, -big), axis=-1)
    mu = jnp.stack([lo, hi], axis=-1)  # (..., 2)

    def body(_, mu):
        # assign to nearest center, recompute weighted means
        d0 = jnp.abs(x - mu[..., 0:1])
        d1 = jnp.abs(x - mu[..., 1:2])
        a1 = (d1 < d0).astype(x.dtype)
        a0 = 1.0 - a1
        n0 = jnp.sum(w * a0, axis=-1)
        n1 = jnp.sum(w * a1, axis=-1)
        m0 = jnp.sum(w * a0 * x, axis=-1) / jnp.maximum(n0, 1e-12)
        m1 = jnp.sum(w * a1 * x, axis=-1) / jnp.maximum(n1, 1e-12)
        m0 = jnp.where(n0 > 0, m0, mu[..., 0])
        m1 = jnp.where(n1 > 0, m1, mu[..., 1])
        return jnp.stack([m0, m1], axis=-1)

    return jax.lax.fori_loop(0, iters, body, mu)


def fit_gmm2(x: jax.Array, mask: jax.Array, *, num_iter: int = 10,
             reg_covar: float = 5e-4, tol: float = 1e-2) -> GmmFit:
    """Fit a 2-component 1-D Gaussian mixture to the masked entries of ``x``.

    x: (..., N) values; mask: (..., N) bool — points excluded by the mask have
    zero responsibility everywhere.  Batched over all leading axes.

    ``tol`` replicates sklearn's convergence semantics (the reference runs
    ``GaussianMixture(max_iter=10, tol=1e-2)``, train_final_voc.py:377):
    sklearn STOPS when the mean log-likelihood moves < tol between
    iterations, so its exit params are a *truncated* EM, not the fixpoint.
    Running a fixed 10 iterations overshoots that — in the heavily
    overlapping regime the extra iterations shift the gamma=0.95 posterior
    boundary enough to flip ~2% of noise-mask pixels vs the reference.  Here
    each batch element freezes its params once its own |Δ mean-LL| < tol,
    inside the fixed-trip-count loop (no data-dependent control flow)."""
    x = x.astype(jnp.float32)
    w = mask.astype(jnp.float32)
    count = jnp.sum(w, axis=-1)
    wsum = jnp.maximum(count, 1e-12)

    mu = _weighted_kmeans_init(x, w)
    # sklearn's kmeans init is a full M step on the hard cluster assignment:
    # per-CLUSTER variances and mixing weights, not a shared global variance.
    # A shared-variance init under-separates overlapping components (the
    # responsibilities start near-uniform and the means collapse), which the
    # sklearn co-run catches in the weak-bimodality regime
    # (tests/test_gmm.py::test_fit_matches_sklearn_overlapping).
    d0 = jnp.abs(x - mu[..., 0:1])
    d1 = jnp.abs(x - mu[..., 1:2])
    a1 = (d1 < d0).astype(x.dtype) * w
    a0 = (1.0 - (d1 < d0).astype(x.dtype)) * w
    n0 = jnp.maximum(jnp.sum(a0, axis=-1), 1e-12)
    n1 = jnp.maximum(jnp.sum(a1, axis=-1), 1e-12)
    v0 = jnp.sum(a0 * (x - mu[..., 0:1]) ** 2, axis=-1) / n0 + reg_covar
    v1 = jnp.sum(a1 * (x - mu[..., 1:2]) ** 2, axis=-1) / n1 + reg_covar
    var = jnp.stack([v0, v1], axis=-1)
    pi = jnp.stack([n0, n1], axis=-1) / wsum[..., None]

    def em(_, state):
        mu, var, pi, prev_lb, done = state
        # E step: joint log-densities (..., N, 2) + the mean log-likelihood
        # sklearn's tol monitors (its `lower_bound_`)
        diff = x[..., None] - mu[..., None, :]
        logp = (
            -0.5 * (diff * diff) / var[..., None, :]
            - 0.5 * jnp.log(2.0 * jnp.pi * var[..., None, :])
            + jnp.log(jnp.maximum(pi[..., None, :], 1e-12))
        )
        log_norm = jax.scipy.special.logsumexp(logp, axis=-1)  # (..., N)
        lb = jnp.sum(w * log_norm, axis=-1) / wsum             # (...,)
        resp = jnp.exp(logp - log_norm[..., None]) * w[..., None]
        # M step
        nk = jnp.sum(resp, axis=-2)  # (..., 2)
        nk_safe = jnp.maximum(nk, 1e-12)
        mu_new = jnp.sum(resp * x[..., None], axis=-2) / nk_safe
        d2 = (x[..., None] - mu_new[..., None, :]) ** 2
        var_new = jnp.sum(resp * d2, axis=-2) / nk_safe + reg_covar
        pi_new = nk / wsum[..., None]
        # freeze converged elements exactly where sklearn breaks: params
        # keep this iteration's m-step, later iterations are no-ops
        keep = done[..., None]
        mu = jnp.where(keep, mu, mu_new)
        var = jnp.where(keep, var, var_new)
        pi = jnp.where(keep, pi, pi_new)
        prev_lb_new = jnp.where(done, prev_lb, lb)
        done = done | (jnp.abs(lb - prev_lb) < tol)
        return mu, var, pi, prev_lb_new, done

    neg_inf = jnp.full(wsum.shape, -jnp.inf, jnp.float32)
    not_done = jnp.zeros(wsum.shape, bool)
    mu, var, pi, _, _ = jax.lax.fori_loop(
        0, num_iter, em, (mu, var, pi, neg_inf, not_done))
    return GmmFit(mu, var, pi, count)


def posterior(fit: GmmFit, x: jax.Array) -> jax.Array:
    """p(component | x) for each component; x: (..., N) -> (..., N, 2)."""
    diff = x[..., None].astype(jnp.float32) - fit.means[..., None, :]
    logp = (
        -0.5 * (diff * diff) / fit.var[..., None, :]
        - 0.5 * jnp.log(2.0 * jnp.pi * fit.var[..., None, :])
        + jnp.log(jnp.maximum(fit.weights[..., None, :], 1e-12))
    )
    return jax.nn.softmax(logp, axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=("num_iter", "reg_covar", "loss_floor", "min_pixels",
                     "valid_thre", "gamma", "ignore_index"),
)
def gmm_filter_labels(
    loss_map: jax.Array,
    label: jax.Array,
    *,
    num_iter: int = 10,
    reg_covar: float = 5e-4,
    loss_floor: float = 0.1,
    min_pixels: int = 1000,
    valid_thre: float = 1.0,
    gamma: float = 0.95,
    ignore_index: int = 255,
) -> jax.Array:
    """Mark noisy pseudo-label pixels as ``ignore_index``
    (reference: train_final_voc.py:358-394).

    loss_map: (B, H, W) detached per-pixel CE of the seg head against its own
    refined label; label: (B, H, W) refined pseudo-label.  Per image: fit a
    2-component GMM on foreground-pixel losses above ``loss_floor``; if more
    than ``min_pixels`` such pixels exist and the two means are further apart
    than ``valid_thre``, pixels whose posterior of the high-mean ("noise")
    component exceeds ``gamma`` — and that are not background — are relabelled
    ``ignore_index``.
    """
    b, h, w = loss_map.shape
    x = loss_map.reshape(b, h * w)
    lab = label.reshape(b, h * w)
    roi = (lab != 0) & (lab != ignore_index)
    fit_mask = roi & (x > loss_floor)

    fit = fit_gmm2(x, fit_mask, num_iter=num_iter, reg_covar=reg_covar)
    post = posterior(fit, x)  # (B, HW, 2)

    noise_comp = jnp.argmax(fit.means, axis=-1)  # (B,)
    # where-select instead of take_along_axis: minor-dim gathers lower to
    # per-element dynamic slices on TPU
    p_noise = jnp.where((noise_comp == 1)[:, None], post[..., 1], post[..., 0])

    valid = (fit.count > min_pixels) & (
        jnp.abs(fit.means[..., 1] - fit.means[..., 0]) > valid_thre
    )
    noise_mask = (p_noise > gamma) & (lab != 0) & valid[:, None]
    out = jnp.where(noise_mask, ignore_index, lab)
    return out.reshape(b, h, w)
