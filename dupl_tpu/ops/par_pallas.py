"""PAR propagation as a Pallas TPU kernel.

The XLA formulation of PAR's mask propagation (ops/par.py:propagate) re-pads
and re-reads the mask from HBM for all 48 taps on every one of the 10
iterations — pure HBM-bandwidth burn for a few MFLOP of VPU work.  This kernel
keeps the mask tile AND the 48-tap affinity resident in VMEM across all
iterations; each iteration rebuilds the replicate-padded scratch in VMEM and
accumulates the 48 shifted multiply-adds on the VPU.

Grid: (batch, channel-tiles), channel-minor so the per-image affinity block is
fetched once per image (consecutive grid steps with an unchanged index map
reuse the buffer).  VMEM budget at the training size (224², 48 taps, 8-channel
tiles): affinity bf16 4.8 MB + padded scratch f32 2.9 MB + in/out tiles
1.6 MB x 2 ≈ 11 MB.

Semantics identical to model/PAR.py:87-89 (and ops/par.py):
``mask <- sum_k neighbor_k(mask) * aff_k`` with edge replication.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dupl_tpu.ops.par import OFFSETS


def _offsets(dilations: Sequence[int]):
    return [(dy * d, dx * d) for d in dilations for dy, dx in OFFSETS]


def _kernel(aff_ref, mask_ref, out_ref, scratch, *, offsets, num_iter, h, w, pad):
    # refs carry a leading block dim of 1: (1, K|CT, H, W)
    ct = out_ref.shape[1]
    cdt = scratch.dtype  # compute dtype: f32, or bf16 (halved VMEM traffic)
    out_ref[0] = mask_ref[0]

    def body(_, carry):
        # replicate-pad the current mask into scratch
        cur = out_ref[0].astype(cdt)
        scratch[:, pad:pad + h, pad:pad + w] = cur
        top = cur[:, 0:1, :]
        bot = cur[:, h - 1:h, :]
        scratch[:, 0:pad, pad:pad + w] = jnp.broadcast_to(top, (ct, pad, w))
        scratch[:, pad + h:, pad:pad + w] = jnp.broadcast_to(bot, (ct, pad, w))
        # after rows are set, replicate full columns (covers the corners)
        left = scratch[:, :, pad:pad + 1]
        scratch[:, :, 0:pad] = jnp.broadcast_to(left, (ct, h + 2 * pad, pad))
        right = scratch[:, :, pad + w - 1:pad + w]
        scratch[:, :, pad + w:] = jnp.broadcast_to(right, (ct, h + 2 * pad, pad))

        # accumulate in fused groups of taps: within a group Mosaic evaluates
        # the multiply-add chain in vector registers (one pass over the
        # (ct, h, w) block), and only each group's result touches out_ref —
        # 48/group_size read-modify-write VMEM passes instead of 48.  A single
        # fully-fused 48-term chain is faster still but Mosaic keeps every
        # term's temporary live on the VMEM stack (~108 MB at the batch-32
        # refine size — scoped-vmem OOM); groups bound the live set.
        # Under bf16 compute the taps/affinities multiply and group-sum in
        # bf16 (mask values and weights live in [0, 1]; a group is ≤8 terms)
        # and only each group's partial sum is accumulated in f32.
        group = 8
        for g0 in range(0, len(offsets), group):
            acc = None
            for k, (dy, dx) in enumerate(offsets[g0:g0 + group], start=g0):
                tap = scratch[:, pad + dy:pad + dy + h, pad + dx:pad + dx + w]
                term = tap * aff_ref[0, k][None]
                acc = term if acc is None else acc + term
            if g0 == 0:
                out_ref[0] = acc.astype(jnp.float32)
            else:
                out_ref[0] += acc.astype(jnp.float32)
        return carry

    jax.lax.fori_loop(0, num_iter, body, 0)


@functools.partial(jax.jit, static_argnames=(
    "dilations", "num_iter", "channel_tile", "compute_dtype", "interpret",
    "aff_layout"))
def propagate_pallas(
    masks: jax.Array,
    aff: jax.Array,
    dilations: Sequence[int] = (1, 2, 4, 8, 12, 24),
    num_iter: int = 10,
    channel_tile: int = 8,
    compute_dtype: str = "float32",
    interpret: bool = False,
    aff_layout: str = "bhwk",
) -> jax.Array:
    """masks: (B, H, W, C); aff: (B, H, W, K) — or (B, K, H, W) with
    ``aff_layout="bkhw"`` (the layout :func:`affinity_pallas` emits, skipping
    a 300 MB transpose at the inference refine size).  Returns (B, H, W, C).

    ``compute_dtype="bfloat16"`` runs the tap reads/multiplies in bf16 with
    f32 group accumulation — ~1% value deviation over 10 iterations (inputs
    are probabilities in [0, 1]), argmax-stable on pseudo-labels; use for
    inference pipelines, keep the f32 default for training parity."""
    b, h, w, c = masks.shape
    k = aff.shape[1] if aff_layout == "bkhw" else aff.shape[-1]
    pad = max(dilations)
    ct = channel_tile
    cp = -(-c // ct) * ct
    cdt = jnp.dtype(compute_dtype)

    m = jnp.moveaxis(masks, -1, 1).astype(jnp.float32)          # (B, C, H, W)
    if cp != c:
        m = jnp.pad(m, ((0, 0), (0, cp - c), (0, 0), (0, 0)))
    a = (aff if aff_layout == "bkhw"
         else jnp.moveaxis(aff, -1, 1)).astype(cdt)             # (B, K, H, W)

    kern = functools.partial(
        _kernel, offsets=tuple(_offsets(dilations)), num_iter=num_iter,
        h=h, w=w, pad=pad,
    )
    out = pl.pallas_call(
        kern,
        grid=(b, cp // ct),
        in_specs=[
            pl.BlockSpec((1, k, h, w), lambda bi, ci: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ct, h, w), lambda bi, ci: (bi, ci, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ct, h, w), lambda bi, ci: (bi, ci, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, cp, h, w), jnp.float32),
        scratch_shapes=[pltpu.VMEM((ct, h + 2 * pad, w + 2 * pad), cdt)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(a, m)
    return jnp.moveaxis(out[:, :c], 1, -1)


def _aff_kernel(xp_ref, out_ref, logits, *, offsets, pos, inv_w1, h, w, bh, pad):
    """Affinity for one row-band of one image, everything VMEM-resident.

    xp_ref: (1, 3, Hp, Wp) — the WHOLE edge-padded image in channels-first
    layout (W minor: full vector lanes); consecutive row-band programs reuse
    the fetched buffer (unchanged index map).  The band's window is loaded
    with a dynamic row start — overlapping halo windows cannot be expressed
    as standard block indexing.
    logits scratch: (K, bh, w) f32.  out: (1, K, bh, w)."""
    i = pl.program_id(1)
    xw = xp_ref[0, :, pl.ds(i * bh, bh + 2 * pad), :]  # (3, bh+2p, Wp) f32
    x = xw[:, pad:pad + bh, pad:pad + w]

    k = len(offsets)
    s1 = jnp.zeros_like(x)
    s2 = jnp.zeros_like(x)
    for dy, dx in offsets:
        t = xw[:, pad + dy:pad + dy + bh, pad + dx:pad + dx + w]
        s1 = s1 + t
        s2 = s2 + t * t
    mean = s1 * (1.0 / k)
    var = jnp.maximum(s2 - k * mean * mean, 0.0) * (1.0 / (k - 1))
    inv = inv_w1 / (jnp.sqrt(var) + 1e-8)                      # (3, bh, w)

    for j, (dy, dx) in enumerate(offsets):
        t = xw[:, pad + dy:pad + dy + bh, pad + dx:pad + dx + w]
        z = jnp.abs(t - x) * inv
        logits[j] = -jnp.mean(z * z, axis=0)                   # (bh, w)

    sc = logits[:]                                             # (K, bh, w)
    m = jnp.max(sc, axis=0, keepdims=True)
    e = jnp.exp(sc - m)
    out_ref[0] = e / jnp.sum(e, axis=0, keepdims=True)
    # position term: per-tap python-float adds (array constants cannot be
    # captured by a pallas kernel)
    for j, pv in enumerate(pos):
        out_ref[0, j] += pv


@functools.partial(jax.jit, static_argnames=(
    "dilations", "w1", "w2", "row_tile", "interpret"))
def affinity_pallas(
    imgs: jax.Array,
    dilations: Sequence[int] = (1, 2, 4, 8, 12, 24),
    w1: float = 0.3,
    w2: float = 0.01,
    row_tile: int = 56,
    interpret: bool = False,
) -> jax.Array:
    """48-tap RGB affinity as one VMEM-resident kernel; returns (B, K, H, W)
    f32 — the channels-first layout ``propagate_pallas`` consumes directly.

    Numerically identical formulation to ``ops.par.rgb_affinity`` (streaming
    Σx/Σx² std, channel-mean z², max-subtracted softmax, + position term).
    The op is VPU-compute-bound, so the win over XLA's fused elementwise code
    is modest — 34.7 vs 38.2 ms at the inference refine size (32, 224, 224),
    row_tile=56 — but the channels-first output also removes the (B, H, W, K)
    -> (B, K, H, W) transpose ``propagate_pallas`` otherwise performs (300 MB
    at that size).  row_tile=224 (whole image per program) fails remote
    compile on VMEM; 56 measures fastest of {56, 112}."""
    import math as _math

    b, h, w, _ = imgs.shape
    pad = max(dilations)
    bh = min(row_tile, h)
    assert h % bh == 0, (h, bh)
    offsets = tuple(_offsets(dilations))
    k = len(offsets)

    # position affinity, in plain python (static): model/PAR.py:51-62
    dist = [_math.sqrt(2.0) * d if (dy and dx) else float(d)
            for d in dilations for dy, dx in OFFSETS]
    n = len(dist)
    mu = sum(dist) / n
    sd = _math.sqrt(sum((v - mu) ** 2 for v in dist) / (n - 1))
    pl_logits = [-((v / (sd + 1e-8) / w1) ** 2) for v in dist]
    mx = max(pl_logits)
    es = [_math.exp(v - mx) for v in pl_logits]
    tot = sum(es)
    pos = tuple(float(w2 * v / tot) for v in es)

    xp = jnp.pad(imgs.astype(jnp.float32),
                 ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
    xp = jnp.moveaxis(xp, -1, 1)                               # (B, 3, Hp, Wp)
    hp, wp = xp.shape[2:]

    kern = functools.partial(
        _aff_kernel, offsets=offsets, pos=pos, inv_w1=1.0 / w1,
        h=h, w=w, bh=bh, pad=pad,
    )
    out = pl.pallas_call(
        kern,
        grid=(b, h // bh),
        in_specs=[pl.BlockSpec((1, 3, hp, wp), lambda bi, ri: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, k, bh, w), lambda bi, ri: (bi, 0, ri, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, k, h, w), jnp.float32),
        scratch_shapes=[pltpu.VMEM((k, bh, w), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(xp)
    return out
