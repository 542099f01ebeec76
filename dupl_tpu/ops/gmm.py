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
             reg_covar: float = 5e-4) -> GmmFit:
    """Fit a 2-component 1-D Gaussian mixture to the masked entries of ``x``.

    x: (..., N) values; mask: (..., N) bool — points excluded by the mask have
    zero responsibility everywhere.  Batched over all leading axes.
    """
    x = x.astype(jnp.float32)
    w = mask.astype(jnp.float32)
    count = jnp.sum(w, axis=-1)
    wsum = jnp.maximum(count, 1e-12)

    mu = _weighted_kmeans_init(x, w)
    # init var from global weighted variance, like sklearn's kmeans-resp M step
    gmean = jnp.sum(w * x, axis=-1) / wsum
    gvar = jnp.sum(w * (x - gmean[..., None]) ** 2, axis=-1) / wsum + reg_covar
    var = jnp.stack([gvar, gvar], axis=-1)
    pi = jnp.full(mu.shape, 0.5, jnp.float32)

    def em(_, state):
        mu, var, pi = state
        # E step: log responsibilities (..., N, 2)
        diff = x[..., None] - mu[..., None, :]
        logp = (
            -0.5 * (diff * diff) / var[..., None, :]
            - 0.5 * jnp.log(2.0 * jnp.pi * var[..., None, :])
            + jnp.log(jnp.maximum(pi[..., None, :], 1e-12))
        )
        logp = logp - jax.scipy.special.logsumexp(logp, axis=-1, keepdims=True)
        resp = jnp.exp(logp) * w[..., None]
        # M step
        nk = jnp.sum(resp, axis=-2)  # (..., 2)
        nk_safe = jnp.maximum(nk, 1e-12)
        mu_new = jnp.sum(resp * x[..., None], axis=-2) / nk_safe
        d2 = (x[..., None] - mu_new[..., None, :]) ** 2
        var_new = jnp.sum(resp * d2, axis=-2) / nk_safe + reg_covar
        pi_new = nk / wsum[..., None]
        return mu_new, var_new, pi_new

    mu, var, pi = jax.lax.fori_loop(0, num_iter, em, (mu, var, pi))
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
