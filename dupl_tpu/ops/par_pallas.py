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
    "dilations", "num_iter", "channel_tile", "compute_dtype", "interpret"))
def propagate_pallas(
    masks: jax.Array,
    aff: jax.Array,
    dilations: Sequence[int] = (1, 2, 4, 8, 12, 24),
    num_iter: int = 10,
    channel_tile: int = 8,
    compute_dtype: str = "float32",
    interpret: bool = False,
) -> jax.Array:
    """masks: (B, H, W, C); aff: (B, H, W, K). Returns (B, H, W, C).

    ``compute_dtype="bfloat16"`` runs the tap reads/multiplies in bf16 with
    f32 group accumulation — ~1% value deviation over 10 iterations (inputs
    are probabilities in [0, 1]), argmax-stable on pseudo-labels; use for
    inference pipelines, keep the f32 default for training parity."""
    b, h, w, c = masks.shape
    k = aff.shape[-1]
    pad = max(dilations)
    ct = channel_tile
    cp = -(-c // ct) * ct
    cdt = jnp.dtype(compute_dtype)

    m = jnp.moveaxis(masks, -1, 1).astype(jnp.float32)          # (B, C, H, W)
    if cp != c:
        m = jnp.pad(m, ((0, 0), (0, cp - c), (0, 0), (0, 0)))
    a = jnp.moveaxis(aff, -1, 1).astype(cdt)                    # (B, K, H, W)

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
