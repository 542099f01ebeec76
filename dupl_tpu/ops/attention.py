"""Attention dispatch: Pallas flash attention on TPU for long sequences, XLA
fused attention otherwise.

At the 672² CAM scale the ViT runs 1765 tokens; XLA's attention materialises
the (B, H, N, N) score tensor in HBM and becomes bandwidth-bound (~3x slower
than flash at this size on v5e).  The Pallas flash kernel keeps running
max/sum statistics in VMEM.  Sequences are padded to a block multiple with
segment-id masking so padded keys get zero weight; padded query rows are
sliced off.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_FLASH_MIN_SEQ = 512


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


def dot_attention(q: jax.Array, k: jax.Array, v: jax.Array, *, scale: float) -> jax.Array:
    """q, k, v: (B, N, H, D) -> (B, N, H, D)."""
    b, n, h, d = q.shape
    if not _use_flash_backend() or n < _FLASH_MIN_SEQ:
        return jax.nn.dot_product_attention(q, k, v, scale=scale)

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
