"""Dynamic int8 quantization for the inference path.

v5e's MXU runs int8 at ~1.5-2x its bf16 rate (measured 188 TOPS vs 122
TFLOPS on this chip).  ``quantized_matmul`` implements w8a8 GEMM with
per-output-channel weight scales and per-row (per-token) activation scales —
the standard ViT post-training-quantization recipe; both quantizations happen
on the fly inside the jitted program (weights are function inputs, so there is
no offline packing step, and the quantize cost is negligible next to the GEMM).

Used only by inference pipelines (``ModelConfig.quantized_inference``); the
training path keeps bf16/f32 exactly.

Measured result (v5e, ViT-B cam_only, batch 32 @672²): CAM argmax agreement
99.996% / correlation 0.9998 vs bf16, but 688 ms vs 420 ms — the per-call
dynamic activation quantization (extra full-tensor passes) costs more than the
int8 MXU rate saves at ViT-B's K=768.  Left OFF by default; it becomes
profitable with offline weight packing + fused activation quant (future work).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantized_matmul(x: jax.Array, w: jax.Array) -> jax.Array:
    """x: (..., K) float; w: (K, N) float -> (..., N) float32.

    Per-row activation scales, per-column weight scales, int8 x int8 -> int32
    accumulation on the MXU, float rescale.
    """
    orig_shape = x.shape
    k = orig_shape[-1]
    x2 = x.reshape(-1, k).astype(jnp.float32)

    s_a = jnp.max(jnp.abs(x2), axis=1, keepdims=True) / 127.0
    s_a = jnp.maximum(s_a, 1e-8)
    x8 = jnp.clip(jnp.round(x2 / s_a), -127, 127).astype(jnp.int8)

    w = w.astype(jnp.float32)
    s_w = jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0
    s_w = jnp.maximum(s_w, 1e-8)
    w8 = jnp.clip(jnp.round(w / s_w), -127, 127).astype(jnp.int8)

    y = jax.lax.dot_general(
        x8, w8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    ).astype(jnp.float32)
    y = y * s_a * s_w
    return y.reshape(orig_shape[:-1] + (w.shape[1],))
