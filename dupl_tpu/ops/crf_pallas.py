"""Fused CRF kernel-apply as a Pallas TPU kernel.

The fast-CRF's final full-resolution slice (ops/crf.py:cross_apply) builds a
(N_pixels, N_pivots) kernel matrix tile by tile: a skinny basis matmul, an
exp, and a value matmul.  Under XLA the fp32 score tile and the bf16 kernel
tile both round-trip HBM between those stages (~2.5 GB per 448² image at the
s=8 pivot count) — the apply is bandwidth-bound, not exp-bound.  This kernel
is the flash-attention formulation of the same contraction: each query-row
block computes scores against ALL pivots in VMEM, exponentiates in registers,
and immediately contracts with the value matrix; only the (N, V) output ever
touches HBM.

Semantics match ops/crf.py:cross_apply exactly (same clamp, same bf16
rounding of the kernel entries before the value matmul); parity is pinned by
tests/test_crf_fast.py in interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _pad_to(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _kernel(basis_ref, coef_ref, logc_ref, vals_ref, out_ref):
    bt = basis_ref[0]                               # (bq, 16) f32
    s = jax.lax.dot_general(bt, coef_ref[0], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    # d² ≥ 0 analytically so log k ≤ logc; the clamp also zeroes padded pivot
    # columns (their logc rides at -inf, and padded vals rows are zero).
    k = jnp.exp(jnp.minimum(s, logc_ref[0])).astype(jnp.bfloat16)
    out_ref[0] = jax.lax.dot_general(
        k, vals_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def kernel_apply(basis: jax.Array, coef: jax.Array, logc: jax.Array,
                 vals: jax.Array, block_rows: int = 512,
                 interpret: bool = False) -> jax.Array:
    """Fused ``exp(min(basis @ coef, logc)) @ vals``.

    basis: (N, D) fp32 — per-pixel quadratic-form basis (D = 11 for 5-D
    bilateral features; lane-padded to 16 here).
    coef: (D, Ns) fp32; logc: (Ns,) fp32; vals: (Ns, V).
    Returns (N, V) fp32.  Kernel entries are rounded to bf16 before the value
    contraction — identical numerics to the XLA tile formulation it replaces.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = basis.shape
    ns, v = vals.shape
    np_ = _pad_to(n, block_rows)
    nsp = _pad_to(ns, 128)
    dp = _pad_to(d, 8)
    vp = _pad_to(v, 128)

    basis_p = jnp.pad(basis.astype(jnp.float32), ((0, np_ - n), (0, dp - d)))
    coef_p = jnp.pad(coef.astype(jnp.float32), ((0, dp - d), (0, nsp - ns)))
    # padded pivot columns: scores are 0 (zero coef), clamped to -inf -> k = 0
    logc_p = jnp.pad(logc.astype(jnp.float32), (0, nsp - ns),
                     constant_values=-jnp.inf)[None, :]
    vals_p = jnp.pad(vals.astype(jnp.bfloat16), ((0, nsp - ns), (0, vp - v)))

    out = pl.pallas_call(
        _kernel,
        grid=(np_ // block_rows,),
        in_specs=[
            pl.BlockSpec((1, block_rows, dp), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dp, nsp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nsp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nsp, vp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_rows, vp), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, np_, vp), jnp.float32),
        interpret=interpret,
    )(basis_p[None], coef_p[None], logc_p[None], vals_p[None])
    return out[0, :n, :v]
