"""Attention dispatch, tuned per sequence length on v5e.

At DuPL's sizes (ViT-B/16, 197-1765 tokens, head_dim 64) attention is
VPU-softmax-bound, not MXU-bound: every kernel tried (Pallas flash, splash,
XLA fused, raw einsum) plateaus at 13-19 TFLOPS at N=785 because the
B·H·N² exp/max/sum work dominates the two head_dim-64 matmuls.  Measured
in-jit on the live chip (ms per application, 64 seqs x 12 heads):

    N=785:  raw einsum + bf16 softmax 6.5 | flash bq=448 7.2 | XLA dpa 9.6
    N=1765: XLA dpa 13.0 | flash bq=448 15.7 | raw 19.3 | splash 40

Dispatch: mid-length sequences use the raw einsum with a bf16 softmax
(fp32-accumulated denominator) — materialising the (B, H, N, N) scores in
bf16 is cheaper than flash's tile bookkeeping here.  Long sequences use the
Pallas flash kernel: XLA's fused attention is ~17% faster per-op but
materialises the score tensor (~10 GB at inference batch 32 x 1792 tokens),
while flash keeps running max/sum statistics in VMEM.  Sequences are padded
to a block multiple with segment-id masking so padded keys get zero weight.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_RAW_MIN_SEQ = 512     # below: XLA fused attention (scores are small)
_FLASH_MIN_SEQ = 1024  # above: flash (raw scores too big, dpa materialises)


def _pad_to(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _block_q(n_padded: int) -> int:
    for b in (512, 448, 256, 128):
        if n_padded % b == 0:
            return b
    return 128


@functools.lru_cache(maxsize=None)
def _use_flash_backend() -> bool:
    return jax.default_backend() == "tpu"


def _raw_attention(q: jax.Array, k: jax.Array, v: jax.Array, scale: float) -> jax.Array:
    """Materialised-scores attention with a bf16 softmax whose denominator
    accumulates in fp32 (sum of ≤2k bf16 terms in bf16 would lose ~1%)."""
    s = jnp.einsum("bnhd,bmhd->bhnm", (q * scale).astype(jnp.bfloat16),
                   k.astype(jnp.bfloat16))
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp((s - m).astype(jnp.float32)).astype(jnp.bfloat16)
    denom = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
    p = (e * (1.0 / denom)).astype(jnp.bfloat16)
    out = jnp.einsum("bhnm,bmhd->bnhd", p, v.astype(jnp.bfloat16))
    return out.astype(q.dtype)


def dot_attention(q: jax.Array, k: jax.Array, v: jax.Array, *, scale: float) -> jax.Array:
    """q, k, v: (B, N, H, D) -> (B, N, H, D)."""
    b, n, h, d = q.shape
    if not _use_flash_backend() or n < _RAW_MIN_SEQ:
        return jax.nn.dot_product_attention(q, k, v, scale=scale)
    if n < _FLASH_MIN_SEQ:
        return _raw_attention(q, k, v, scale)

    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    np_ = _pad_to(n, 128)
    bq = _block_q(np_)

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
