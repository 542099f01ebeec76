"""Attention dispatch, tuned per sequence length on v5e.

At DuPL's sizes (ViT-B/16, 197-1765 tokens, head_dim 64) attention is
VPU-softmax-bound, not MXU-bound: every generic kernel tried (Pallas flash,
splash, XLA fused, raw einsum) plateaus at 13-19 TFLOPS at N=785 because the
B·H·N² exp/max/sum work dominates the two head_dim-64 matmuls.  Measured
in-jit on the live chip (ms per application, 64 seqs x 12 heads):

    N=785:  raw einsum + bf16 softmax 6.5 | flash bq=448 7.2 | XLA dpa 9.6
    N=1765: XLA dpa 13.0 | flash bq=448 15.7 | raw 19.3 | splash 40

Dispatch: every TPU sequence in [128, 2048) uses :func:`exp_attention` — a
max-free single-pass Pallas kernel exploiting two properties of this regime
that the generic kernels cannot assume:

* K and V for a whole (batch, head) fit in VMEM (1792 x 64 bf16 = 229 KB
  each), so each query block computes ``exp(q·kᵀ)`` against ALL keys at once:
  no K-loop, no running-max/denominator rescaling bookkeeping (flash), and no
  HBM score materialisation (raw einsum / XLA dpa, ~10 GB at inference
  batch 32 x 1792 tokens).
* softmax(x) = exp(x)/Σexp(x) without the max subtraction, which removes one
  full pass over the B·H·N² scores.  Unnormalised exp is safe here: ViT
  attention logits are bounded far below fp32's exp overflow (~88), and the
  kernel clamps at 60 as a hard backstop (distortion only if a logit exceeds
  60 — never observed in DeiT/ViT-B).

The kernel carries a ``jax.custom_vjp`` whose backward recomputes through the
pure-XLA reference formulation, so the grad path (448-crop training forwards)
uses it too.  Outside its window: XLA fused attention below 128 (cls-token
scale tests only), Pallas flash above 2048 (K/V no longer VMEM-resident).

In-pipeline measurements (tools/bench_components.py, batch 16, the authority
— isolated micro-benchmarks disagree BOTH ways at these sizes; e.g. XLA's
fused attention looks 1.7x faster than this kernel at N=1765 in isolation but
is 2x slower inside the vmapped pipeline where its fp32 score tensor thrashes
HBM): cam_only scale-1.0 206 -> 162 ms and scale-0.5 58 -> 53 ms vs the raw
bf16-softmax einsum; scale-1.5 691 (XLA dpa) / 346 (this kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_EXP_MIN_SEQ = 128    # below: XLA fused attention (scores are small)
_EXP_MAX_SEQ = 2048   # above: flash (K/V no longer VMEM-resident)
_LOGIT_CLAMP = 60.0


def _pad_to(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _block_q(n_padded: int) -> int:
    # Full-row query blocks measure fastest for the exp kernel (15.8 vs 16.2
    # ms/layer at N=1792, 7.2 vs 7.5 at 896: fewer grid programs, K/V fetched
    # once).  The fp32 score block n² x 4 B stays ≤ 16.8 MB at the 2048-token
    # kernel ceiling.
    if n_padded <= 2048:
        return n_padded
    return _flash_block_q(n_padded)


def _flash_block_q(n_padded: int) -> int:
    # The flash path always wants bounded blocks — including at exactly
    # n_padded == 2048 (n == 2048 dispatches to flash, not the exp kernel,
    # and a 2048² fp32 score tile would blow scoped VMEM there).
    for b in (512, 448, 256, 128):
        if n_padded % b == 0:
            return b
    return 128


def _use_flash_backend() -> bool:
    # trace-time gate; kernel_platform() honors the cross-platform-export
    # override (utils/platform.py:force_kernel_platform)
    from dupl_tpu.utils.platform import kernel_platform
    return kernel_platform() == "tpu"


def _exp_attention_ref(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Pure-XLA reference for the exp-attention kernel: q pre-scaled,
    inputs/outputs (BH, N, D).  Used for the custom-vjp backward (recompute)
    and for kernel parity tests."""
    s = jnp.einsum("bnd,bmd->bnm", q.astype(jnp.bfloat16),
                   k.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    e = jnp.exp(jnp.minimum(s, _LOGIT_CLAMP))
    denom = jnp.sum(e, axis=-1, keepdims=True)
    out = jnp.einsum("bnm,bmd->bnd", e.astype(jnp.bfloat16),
                     v.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    return out / denom


def _exp_attn_kernel(q_ref, kt_ref, v_ref, o_ref, *, n_pad: int):
    """Padding is handled by arithmetic, not masking: zero-padded K columns
    score s=0 → e=1, contributing exactly ``n_pad`` to each row's denominator
    (subtracted below); zero-padded V rows contribute nothing to e@V.  This
    keeps the per-score VPU work at min+exp — a mask (iota/compare/select)
    tripled it."""
    q = q_ref[0]                                   # (bq, D) bf16, pre-scaled
    kt = kt_ref[0]                                 # (D, Np) bf16, pre-transposed
    s = jax.lax.dot_general(q, kt, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    e = jnp.exp(jnp.minimum(s, _LOGIT_CLAMP))      # fp32 (bq, Np)
    denom = jnp.sum(e, axis=1, keepdims=True) - float(n_pad)
    pv = jax.lax.dot_general(e.astype(jnp.bfloat16), v_ref[0],
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    o_ref[0] = (pv / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _exp_attention_bhnd(q: jax.Array, k: jax.Array, v: jax.Array,
                        interpret: bool = False) -> jax.Array:
    """q (pre-scaled), k, v: (BH, N, D) bf16 -> (BH, N, D) fp32.

    K rides pre-transposed to (BH, D, N): an in-kernel transpose (contraction
    on k's minor dim) compiles to a per-program VMEM shuffle that dominated
    the runtime in the first version of this kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bh, n, d = q.shape
    np_ = _pad_to(n, 128)
    bq = _block_q(np_)

    def padn(x):
        return jnp.pad(x, ((0, 0), (0, np_ - n), (0, 0)))

    qp, vp = padn(q), padn(v)
    ktp = jnp.pad(k.transpose(0, 2, 1), ((0, 0), (0, 0), (0, np_ - n)))
    out = pl.pallas_call(
        functools.partial(_exp_attn_kernel, n_pad=np_ - n),
        grid=(bh, np_ // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, np_), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        # bf16 output: the fp32 pv/denom result is rounded in-kernel.  Every
        # consumer either runs a bf16 residual stream (inference) or casts to
        # bf16 at the next matmul anyway; emitting bf16 halves the kernel's
        # output HBM traffic and the following reshape/transpose pass.
        out_shape=jax.ShapeDtypeStruct((bh, np_, d), jnp.bfloat16),
        interpret=interpret,
    )(qp, ktp, vp)
    return out[:, :n]


_BWD_MAX_SEQ = 896   # full-row bwd kernel VMEM ceiling (4 N x N f32 buffers);
                     # covers every grad-path shape (448-crop: 785 -> 896,
                     # 0.75x strong-aug view: 442 -> 448)


def _exp_attn_bwd_kernel(q_ref, kt_ref, v_ref, g_ref,
                         dq_ref, dk_ref, dv_ref, *, n_pad: int):
    """Fused attention backward, one program per (batch, head): recomputes the
    forward's scores in VMEM (the XLA recompute it replaces round-trips the
    (BH, N, N) fp32 score tensor through HBM several times — ~0.5 GB/step at
    448-crop training) and emits all three grads with the classic
    delta = rowsum(p * (g @ vT)) softmax-vjp identity.  Zero-padding algebra as
    in the forward kernel: padded K columns contribute e=1 to the denominator
    (subtracted), padded q/g rows are zero so every padded grad row is zero."""
    q = q_ref[0]                                   # (N, D) bf16, pre-scaled
    kt = kt_ref[0]                                 # (D, N) bf16
    v = v_ref[0]                                   # (N, D) bf16
    g = g_ref[0]                                   # (N, D) bf16
    s = jax.lax.dot_general(q, kt, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    e = jnp.exp(jnp.minimum(s, _LOGIT_CLAMP))      # (N, N) fp32
    denom = jnp.sum(e, axis=1, keepdims=True) - float(n_pad)
    p = e / denom
    # t = g @ vT; delta_n = sum_m p[n,m] t[n,m] = rowsum(o * g) per query row
    t = jax.lax.dot_general(g, v, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    delta = jnp.sum(p * t, axis=1, keepdims=True)
    ds = jnp.where(s < _LOGIT_CLAMP, p * (t - delta), 0.0).astype(jnp.bfloat16)
    dq = jax.lax.dot_general(ds, kt, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dv = jax.lax.dot_general(p.astype(jnp.bfloat16), g, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _exp_attention_bwd_fused(q, k, v, g, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bh, n, d = q.shape
    np_ = _pad_to(n, 128)

    def padn(x):
        return jnp.pad(x.astype(jnp.bfloat16), ((0, 0), (0, np_ - n), (0, 0)))

    qp, vp, gp = padn(q), padn(v), padn(g)
    ktp = jnp.pad(k.astype(jnp.bfloat16).transpose(0, 2, 1),
                  ((0, 0), (0, 0), (0, np_ - n)))
    row = pl.BlockSpec((1, np_, d), lambda b: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    col = pl.BlockSpec((1, d, np_), lambda b: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct((bh, np_, d), q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_exp_attn_bwd_kernel, n_pad=np_ - n),
        grid=(bh,),
        in_specs=[row, col, row, row],
        out_specs=[row, row, row],
        out_shape=[out, out, out],
        interpret=interpret,
    )(qp, ktp, vp, gp)
    return dq[:, :n], dk[:, :n], dv[:, :n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _exp_attention(q, k, v, interpret=False):
    return _exp_attention_bhnd(q, k, v, interpret=interpret)


def _exp_attention_fwd(q, k, v, interpret):
    return _exp_attention_bhnd(q, k, v, interpret=interpret), (q, k, v)


def _exp_attention_bwd(interpret, res, g):
    q, k, v = res
    if _pad_to(q.shape[1], 128) <= _BWD_MAX_SEQ:
        return _exp_attention_bwd_fused(q, k, v, g, interpret=interpret)
    _, vjp = jax.vjp(_exp_attention_ref, q, k, v)
    # the primal kernel emits bf16; the fp32 reference vjp needs a matching
    # cotangent dtype
    return vjp(g.astype(jnp.float32))


_exp_attention.defvjp(_exp_attention_fwd, _exp_attention_bwd)


def exp_attention(q: jax.Array, k: jax.Array, v: jax.Array, *, scale: float,
                  interpret: bool = False) -> jax.Array:
    """Max-free single-pass attention; q, k, v: (B, N, H, D) -> same."""
    b, n, h, d = q.shape

    def to_bhnd(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, n, d).astype(jnp.bfloat16)

    out = _exp_attention((to_bhnd(q) * scale).astype(jnp.bfloat16),
                         to_bhnd(k), to_bhnd(v), interpret)
    return out.reshape(b, h, n, d).transpose(0, 2, 1, 3).astype(q.dtype)


def dot_attention(q: jax.Array, k: jax.Array, v: jax.Array, *, scale: float) -> jax.Array:
    """q, k, v: (B, N, H, D) -> (B, N, H, D)."""
    b, n, h, d = q.shape
    if not _use_flash_backend() or n < _EXP_MIN_SEQ:
        return jax.nn.dot_product_attention(q, k, v, scale=scale)
    if n < _EXP_MAX_SEQ:
        return exp_attention(q, k, v, scale=scale)

    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    np_ = _pad_to(n, 128)
    bq = _flash_block_q(np_)

    def to_bhnd(x):
        x = jnp.pad(x, ((0, 0), (0, np_ - n), (0, 0), (0, 0)))
        return x.transpose(0, 2, 1, 3).astype(jnp.bfloat16)

    qp, kp, vp = to_bhnd(q), to_bhnd(k), to_bhnd(v)
    if np_ == n:
        seg = None
    else:
        valid = (jnp.arange(np_) < n)
        ids = jnp.where(valid, 1, 2).astype(jnp.int32)[None].repeat(b, 0)
        seg = fa.SegmentIds(q=ids, kv=ids)

    sizes = fa.BlockSizes(
        block_q=bq, block_k_major=np_, block_k=np_, block_b=1,
        # backward-pass blocks (used when differentiated)
        block_q_major_dkv=bq, block_k_major_dkv=np_,
        block_k_dkv=np_, block_q_dkv=bq,
        block_k_major_dq=np_, block_k_dq=np_, block_q_dq=bq,
    )
    out = fa.flash_attention(qp, kp, vp, segment_ids=seg, sm_scale=scale,
                             block_sizes=sizes)
    return out.transpose(0, 2, 1, 3)[:, :n].astype(q.dtype)
