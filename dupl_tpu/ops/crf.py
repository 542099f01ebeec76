"""Batched mean-field DenseCRF on device.

The reference post-processes every eval image with pydensecrf on the host CPU
("may cost several hours" on COCO — README.md:133; params
tools/eval_seg_voc.py:104-111).  This is the TPU-native replacement and the
headline ≥10x-throughput item (SURVEY.md §7 step 7).

Design: the pairwise model is identical (Gaussian position kernel + bilateral
position/color kernel, Potts compatibility, symmetric normalisation); the
*filtering* differs.  pydensecrf approximates the dense bilateral sum with a
permutohedral lattice; here each ``s x s`` cell of the image is summarised as
a Gaussian blob in the 5-D bilateral feature space (mean μ_j + per-dim
variance σ²_j) and messages to every full-res pixel are computed against the
blobs with the analytically *moment-matched* kernel

    E_{j'∈cell}[exp(-|f_i - f_j'|²/2)]
      ≈ ∏_d (1+σ²_jd)^(-1/2) · exp(-½ Σ_d (f_id - μ_jd)²/(1+σ²_jd)),

which stays one MXU matmul per application (the quadratic form expands over
the basis (f², f, 1) — an 11-wide matmul for d=5).  Plain cell-mean pivots
(the round-1 design) underestimate kernel mass badly on textured cells where
the σ_rgb = 5 color kernel is much sharper than the within-cell color spread;
moment matching adapts per cell and was validated against the permutohedral
oracle on 21-class textured scenes (tests/test_crf.py).  The σ_xy = 1
position kernel is a local 5x5 convolution at full resolution.

Exact parity target is mIoU gain, not marginals (SURVEY.md §7 "CRF fidelity");
the oracle for validation is the native permutohedral implementation
(dupl_tpu.ops.crf_native).
"""

from __future__ import annotations

import functools
from typing import Optional
import jax
import jax.numpy as jnp

from dupl_tpu.config import CrfConfig


def _use_pallas_apply() -> bool:
    """Default OFF: the fused Pallas kernel-apply (ops/crf_pallas.py) wins
    when the apply is its own dispatch (93 -> 75 ms standalone,
    tools/crf_apply_experiment.py) but measures 4.3% SLOWER inside the fused
    inference pipeline (26.8 vs 28.0 img/s, tools/crf_ab_pipeline.py with
    per-arm static flags) — XLA overlaps the tile loop with surrounding work
    the kernel serialises.  Pass ``pallas_apply=True`` to opt in."""
    return False


def _gaussian_kernel_2d(std: float, radius: int) -> jnp.ndarray:
    ax = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k1 = jnp.exp(-0.5 * (ax / std) ** 2)
    k = k1[:, None] * k1[None, :]
    return k


def _pos_message(q: jax.Array, std: float) -> jax.Array:
    """Short-range Gaussian message with filter(ones)=1 normalisation.
    q: (H, W, C).

    The 2-D Gaussian is an outer product, so the filter runs as two 1-D
    convolutions ((2r+1)·2 taps instead of (2r+1)²) — the single-channel 2-D
    conv formulation cannot use the MXU and was the largest single cost of
    the fast-CRF step (~13 ms of ~73 at batch 16, 448²)."""
    radius = max(1, int(2 * std))
    ax = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k1 = jnp.exp(-0.5 * (ax / std) ** 2)
    h, w, c = q.shape

    def conv1d(x, axis):
        # x: (C, 1, H, W); filter along `axis` (2=H, 3=W)
        kk = k1.reshape((1, 1, -1, 1) if axis == 2 else (1, 1, 1, -1))
        return jax.lax.conv_general_dilated(
            x, kk, (1, 1), "SAME", dimension_numbers=("NCHW", "OIHW", "NCHW"))

    x = q.transpose(2, 0, 1)[:, None]              # (C,1,H,W)
    out = conv1d(conv1d(x, 2), 3)
    ones = jnp.ones((1, 1, h, w), q.dtype)
    norm = conv1d(conv1d(ones, 2), 3)
    return (out / norm)[:, 0].transpose(1, 2, 0)


def _features(image01: jax.Array, xy_std: float, rgb_std: float) -> jax.Array:
    """(H, W, 5) scaled bilateral features: x/σxy, y/σxy, rgb*255/σrgb."""
    h, w, _ = image01.shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) / xy_std
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) / xy_std
    rgb = image01 * (255.0 / rgb_std)
    return jnp.concatenate([xs[..., None], ys[..., None], rgb], axis=-1)


def _pool(x: jax.Array, s: int) -> jax.Array:
    """Mean-pool (H, W, C) by s."""
    h, w, c = x.shape
    return x.reshape(h // s, s, w // s, s, c).mean(axis=(1, 3))


@functools.partial(
    jax.jit,
    static_argnames=("iters", "pos_w", "pos_xy_std", "bi_w", "bi_xy_std",
                     "bi_rgb_std", "downsample", "row_chunk", "fast",
                     "return_logits", "pallas_apply"),
)
def mean_field_crf(
    image01: jax.Array,
    probs: jax.Array,
    *,
    iters: int = 10,
    pos_w: float = 1.0,
    pos_xy_std: float = 1.0,
    bi_w: float = 4.0,
    bi_xy_std: float = 121.0,
    bi_rgb_std: float = 5.0,
    downsample: int = 8,
    row_chunk: int = 56,
    fast: bool = False,
    return_logits: bool = False,
    pallas_apply: Optional[bool] = None,
) -> jax.Array:
    """Mean-field inference for a batch.

    image01: (B, H, W, 3) in [0,1]; probs: (B, H, W, C) softmax probabilities.
    Returns (B, H, W, C) marginals.  H and W must be multiples of
    ``downsample`` and ``row_chunk``.

    ``fast=True`` runs the iterations on the pivot lattice (Ns x Ns matmuls)
    and slices to full resolution once at the end — ~8x fewer full-res
    kernel applications at a small fidelity cost.

    ``return_logits=True`` (fast mode) skips the final full-resolution
    softmax: argmax is monotone in softmax, so label consumers get identical
    labels without the (B, H, W, C) exp/sum/divide pass.
    """
    b, h, w, c = probs.shape
    s = downsample
    use_kernel = (_use_pallas_apply() if pallas_apply is None else pallas_apply)

    def one_image(img: jax.Array, p: jax.Array) -> jax.Array:
        feat = _features(img, bi_xy_std, bi_rgb_std)          # (H, W, 5)
        # per-cell Gaussian blobs: mean + per-dim variance (moment matching)
        mu = _pool(feat, s).reshape(-1, 5)                     # (Ns, 5)
        m2 = _pool(feat * feat, s).reshape(-1, 5)
        sig2 = jnp.maximum(m2 - mu * mu, 0.0)                  # (Ns, 5)
        prec = 1.0 / (1.0 + sig2)                              # (Ns, 5)
        logc = -0.5 * jnp.sum(jnp.log1p(sig2), axis=-1)        # (Ns,)
        # K[i, j] = c_j · exp(-½ Σ_d prec_jd (f_id - μ_jd)²); the quadratic
        # form expands over the basis (f², f, 1) so the kernel build is ONE
        # (N, 11) @ (11, Ns) matmul (two skinny matmuls measured ~2x slower)
        coef = jnp.concatenate([
            -0.5 * prec,                                       # · f²
            prec * mu,                                         # · f
            (-0.5 * jnp.sum(prec * mu * mu, axis=-1) + logc)[:, None],
        ], axis=-1).T                                          # (11, Ns)
        cnt = jnp.full((mu.shape[0], 1), float(s * s))         # pixels per cell
        f_full = feat.reshape(-1, 5)                           # (N, 5)
        basis_full = jnp.concatenate(
            [f_full * f_full, f_full, jnp.ones((h * w, 1), jnp.float32)], axis=-1)

        def cross_apply(values_small: jax.Array) -> jax.Array:
            """K_cross @ values_small, tiled over pixel rows.
            values_small: (Ns, V) -> (N, V)."""
            if use_kernel:
                # flash-style fused build+exp+contract: the fp32 score tile
                # and bf16 kernel tile stay in VMEM (the XLA tile loop below
                # round-trips both through HBM — the apply is bandwidth-bound)
                from dupl_tpu.ops.crf_pallas import kernel_apply
                return kernel_apply(basis_full, coef, logc, values_small)

            def tile_fn(bt):
                logk = jnp.dot(bt, coef, preferred_element_type=jnp.float32)
                # d² ≥ 0 analytically, so log k ≤ logc; clamp numerical noise.
                # The kernel matrix and values ride the MXU in bf16 (entries
                # in [0, 1], messages fp32-accumulated: ~0.2% message error,
                # fidelity bounds in tests/test_crf.py hold) — halves the
                # score-matrix traffic of the apply.
                k = jnp.exp(jnp.minimum(logk, logc[None, :])).astype(jnp.bfloat16)
                return jnp.dot(k, values_small.astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)

            n_tiles = h // row_chunk
            bt = basis_full.reshape(n_tiles, row_chunk * w, 11)
            out = jax.lax.map(tile_fn, bt)
            return out.reshape(h * w, -1)

        unary = -jnp.log(jnp.maximum(p, 1e-20))
        q = p

        if fast:
            # iterate entirely on the pivot lattice with the pivot-to-blob
            # kernel (query pivot as a point at its mean — the full blob-blob
            # precision would not be a matmul), slice to full res once at the
            # end.  The iteration-time degree is an exact blob↔blob
            # moment-matched degree (E over BOTH cells' Gaussians): tiny
            # (Ns², chunked) and closer to the full mode than pivot-point
            # degrees, and it removes the full-res degree pass entirely —
            # the final slice recovers the full-res degree as one extra
            # value column of the kernel apply it performs anyway, halving
            # the dominant full-res kernel-build exp() volume.
            basis_small = jnp.concatenate(
                [mu * mu, mu, jnp.ones((mu.shape[0], 1), jnp.float32)], axis=-1)
            # the lattice kernel is re-read every iteration (Ns² × B per
            # sweep, ~6 GB at batch 16): bf16 entries in [0, 1], messages
            # fp32-accumulated — same trade as cross_apply
            ks = jnp.exp(jnp.minimum(basis_small @ coef,
                                     logc[None, :])).astype(jnp.bfloat16)
            us = _pool(unary, s).reshape(-1, c)

            def _bb_degree(mu_c, sig2_c):
                var = 1.0 + sig2_c[:, None, :] + sig2[None, :, :]
                d2 = (mu_c[:, None, :] - mu[None, :, :]) ** 2
                k_bb = jnp.exp(-0.5 * jnp.sum(d2 / var, -1)) * jax.lax.rsqrt(
                    jnp.prod(var, -1))
                return (k_bb @ cnt)[:, 0]

            ns = mu.shape[0]
            chunk = 512 if ns % 512 == 0 else ns
            deg_small = jax.lax.map(
                lambda ab: _bb_degree(*ab),
                (mu.reshape(-1, chunk, 5), sig2.reshape(-1, chunk, 5)),
            ).reshape(ns)
            invf_small = jax.lax.rsqrt(jnp.maximum(deg_small, 1e-12))

            def small_body(_, qs):
                m = jnp.dot(ks, (qs * (invf_small * s * s)[:, None]).astype(
                    jnp.bfloat16), preferred_element_type=jnp.float32)
                m = m * invf_small[:, None]
                return jax.nn.softmax(-us + bi_w * m, axis=-1)

            qs = jax.lax.fori_loop(0, iters - 1, small_body, _pool(p, s).reshape(-1, c))

            # final full-res update: bilateral slice + local position kernel;
            # cnt rides as an extra value column so the full-res degree comes
            # out of the same kernel build
            vals = jnp.concatenate(
                [qs * (invf_small * s * s)[:, None], cnt], axis=-1)
            out_cols = cross_apply(vals)
            inv_sqrt_full = jax.lax.rsqrt(
                jnp.maximum(out_cols[:, c], 1e-12))
            m_bi = (out_cols[:, :c] * inv_sqrt_full[:, None]).reshape(h, w, c)
            q_up = jax.image.resize(qs.reshape(h // s, w // s, c), (h, w, c),
                                    method="nearest")
            m_pos = _pos_message(q_up, pos_xy_std)
            logits = -unary + bi_w * m_bi + pos_w * m_pos
            return logits if return_logits else jax.nn.softmax(logits, axis=-1)

        # degree for symmetric normalisation (computed once):
        # deg_i = sum_j k(i, j) ~= sum_cells s² · E_cell[k(i, ·)]
        deg_full = cross_apply(cnt)[:, 0]                     # (N,)
        inv_sqrt_full = jax.lax.rsqrt(jnp.maximum(deg_full, 1e-12))

        def body(_, q):
            # bilateral message: D^-1/2 K D^-1/2 q, pivot-approximated as
            # invs_i * sum_pivots k(i, j') * cellsum_{j' }(invs_j q_j)
            q_scaled = q * inv_sqrt_full.reshape(h, w, 1)
            qs = _pool(q_scaled, s).reshape(-1, c) * (s * s)   # cell sums
            m_bi = cross_apply(qs) * inv_sqrt_full[:, None]
            m_bi = m_bi.reshape(h, w, c)
            m_pos = _pos_message(q, pos_xy_std)
            logits = -unary + bi_w * m_bi + pos_w * m_pos
            return jax.nn.softmax(logits, axis=-1)

        return jax.lax.fori_loop(0, iters, body, q)

    return jax.vmap(one_image)(image01, probs)


def _auto_tile(h: int, limit: int) -> int:
    """Largest divisor of h not exceeding ``limit``."""
    for t in range(min(limit, h), 0, -1):
        if h % t == 0:
            return t
    return 1


def crf_from_config(image01, probs, cfg: CrfConfig, **kw):
    h = probs.shape[1]
    kw.setdefault("downsample", _auto_tile(h, 8))
    kw.setdefault("row_chunk", _auto_tile(h, 56))
    return mean_field_crf(
        image01, probs, iters=cfg.iter_max, pos_w=cfg.pos_w,
        pos_xy_std=cfg.pos_xy_std, bi_w=cfg.bi_w, bi_xy_std=cfg.bi_xy_std,
        bi_rgb_std=cfg.bi_rgb_std, **kw,
    )


def crf_labels_from_config(image01, probs, cfg: CrfConfig,
                           class_budget: Optional[int] = None, **kw):
    """CRF -> argmax labels, optionally with the class axis compacted to a
    per-image budget (the wide-class-axis throughput lever; VOC runs 21
    classes but COCO runs 81 and the fast CRF costs ~1 ms/class/batch-16 of
    pure full-resolution HBM traffic).

    Compaction picks each image's ``class_budget`` most plausible classes by
    total spatial probability mass (lax.top_k over the per-class sum) and
    runs mean-field on those slots only — equivalent to conditioning the CRF
    on "the label is one of the image's K dominant classes".  Mass, not max:
    mean-field with a long-range bilateral kernel is itself a mass vote, so
    a class with a few high-probability noise pixels (which max would keep)
    never survives it, while a class with broad support always does —
    fidelity bounded in
    tests/test_crf_fast.py::test_class_budget_label_fidelity.  Slot indices
    map back to class ids with a one-hot matmul (per-pixel dynamic gathers
    lower to per-element slices on TPU; the (B, K, C) selection matrix rides
    the MXU — same trick as the PAR class compaction, ops/cam.py).
    """
    b, h, w, c = probs.shape
    if class_budget is None or class_budget >= c:
        lg = crf_from_config(image01, probs, cfg, return_logits=True, **kw)
        return jnp.argmax(lg, axis=-1).astype(jnp.int32)

    k = class_budget
    score = jnp.sum(probs, axis=(1, 2))                      # (B, C)
    _, idx = jax.lax.top_k(score, k)                         # (B, k)
    sel = jax.nn.one_hot(idx, c, dtype=probs.dtype)          # (B, k, C)
    compact = jnp.einsum("bhwc,bkc->bhwk", probs, sel)
    lg = crf_from_config(image01, compact, cfg, return_logits=True, **kw)
    slot = jnp.argmax(lg, axis=-1)                           # (B, H, W)
    onehot = jax.nn.one_hot(slot, k, dtype=jnp.float32)
    ids = jnp.einsum("bhwk,bk->bhw", onehot, idx.astype(jnp.float32))
    return ids.astype(jnp.int32)
