"""ViT/DeiT backbone in flax.linen.

Functional re-design of the reference's timm-style torch ViT
(model/backbone/vit.py:87-336, model/backbone/deit.py:97-109):

* ``forward_features`` returns ``(cls_token, patch_tokens, aux_tokens)`` where
  patch tokens are post-final-LayerNorm and ``aux_tokens`` tap the (pre-norm)
  output of block ``aux_layer`` (vit.py:308-326; ``embeds[-1]`` is replaced by
  the normed output so ``aux_layer=-1`` taps the normed tokens).
* positional embeddings are bicubic-resized from the pretraining grid to the
  input's patch grid every call (``prepare_tokens``, vit.py:289-306) — XLA
  constant-folds this per compiled input shape, so it is free at step time.
* ``pos_embed`` is frozen (vit.py:243 sets ``requires_grad=False``); here that
  is enforced by the optimizer mask (`dupl_tpu.engine.optimizer`).

TPU notes: attention and MLPs run in ``compute_dtype`` (bfloat16 by default) so
the 128x128 MXU runs at full rate; params and the residual stream stay float32.
Sequence length at the 448 train crop is 1+28*28=785 — dense attention is the
right call at this size (SURVEY.md §5.7), no long-context machinery needed.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


@dataclasses.dataclass(frozen=True)
class ViTSpec:
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    pretrained_grid: int = 14  # 224 / 16


VIT_CONFIGS = {
    "deit_tiny_patch16": ViTSpec(embed_dim=192, depth=12, num_heads=3),
    "deit_small_patch16": ViTSpec(embed_dim=384, depth=12, num_heads=6),
    "deit_base_patch16": ViTSpec(embed_dim=768, depth=12, num_heads=12),
    "vit_large_patch16": ViTSpec(embed_dim=1024, depth=24, num_heads=16),
    "vit_huge_patch16": ViTSpec(embed_dim=1280, depth=32, num_heads=16),
    # tiny config for fast tests (SURVEY.md §4 "tiny-ViT fake backbone")
    "test_tiny_patch16": ViTSpec(embed_dim=32, depth=4, num_heads=2),
}


class QDense(nn.Module):
    """Dense with the same parameter tree as ``nn.Dense`` (checkpoints
    interoperate) and an optional dynamic-int8 path
    (``dupl_tpu.ops.quant.quantized_matmul``) for inference pipelines."""

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (x.shape[-1], self.features))
        if self.quant:
            from dupl_tpu.ops.quant import quantized_matmul
            y = quantized_matmul(x, kernel)
        else:
            y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class Mlp(nn.Module):
    hidden: int
    out: int
    dtype: Dtype = jnp.bfloat16
    gelu_approximate: bool = False
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        x = QDense(self.hidden, dtype=self.dtype, quant=self.quant, name="fc1")(x)
        x = nn.gelu(x, approximate=self.gelu_approximate)
        x = QDense(self.out, dtype=self.dtype, quant=self.quant, name="fc2")(x)
        return x


class Attention(nn.Module):
    dim: int
    num_heads: int
    dtype: Dtype = jnp.bfloat16
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        head_dim = self.dim // self.num_heads
        qkv = QDense(self.dim * 3, dtype=self.dtype, quant=self.quant, name="qkv")(x)
        # split as contiguous column ranges (same math as reshape(3, H, D) +
        # index 0/1/2): each slice feeds the attention layout directly, no
        # (b, n, 3, h, d) intermediate + strided slice passes
        q, k, v = (qkv[..., i * self.dim:(i + 1) * self.dim]
                   .reshape(b, n, self.num_heads, head_dim) for i in range(3))
        from dupl_tpu.ops.attention import dot_attention
        x = dot_attention(q.astype(self.dtype), k.astype(self.dtype),
                          v.astype(self.dtype), scale=head_dim ** -0.5)
        x = x.reshape(b, n, c)
        return QDense(self.dim, dtype=self.dtype, quant=self.quant, name="proj")(x)


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float
    dtype: Dtype = jnp.bfloat16
    gelu_approximate: bool = False
    quant: bool = False
    stream_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # Pre-LN residual blocks (vit.py:156-160).  The residual stream runs
        # in ``stream_dtype``: float32 for training (LayerNorm statistics and
        # residual adds at full precision), bfloat16 for inference pipelines —
        # halving HBM traffic on the bandwidth-bound LN/residual/cast chain
        # between the MXU matmuls.
        ln_dtype = None if self.stream_dtype == jnp.float32 else self.stream_dtype
        y = nn.LayerNorm(epsilon=1e-6, dtype=ln_dtype, name="norm1")(x)
        x = x + Attention(self.dim, self.num_heads, self.dtype,
                          quant=self.quant, name="attn")(y).astype(x.dtype)
        y = nn.LayerNorm(epsilon=1e-6, dtype=ln_dtype, name="norm2")(x)
        x = x + Mlp(int(self.dim * self.mlp_ratio), self.dim, self.dtype,
                    self.gelu_approximate, quant=self.quant,
                    name="mlp")(y).astype(x.dtype)
        return x


class ViT(nn.Module):
    spec: ViTSpec
    aux_layer: int = -3
    dtype: Dtype = jnp.bfloat16
    gelu_approximate: bool = False
    quant: bool = False
    remat: bool = False
    stream_dtype: Dtype = jnp.float32

    def setup(self):
        s = self.spec
        self.cls_token = self.param(
            "cls_token", nn.initializers.truncated_normal(0.02), (1, 1, s.embed_dim)
        )
        self.pos_embed = self.param(
            "pos_embed", nn.initializers.truncated_normal(0.02),
            (1, s.pretrained_grid * s.pretrained_grid + 1, s.embed_dim),
        )
        self.patch_embed = nn.Conv(
            s.embed_dim, kernel_size=(s.patch_size, s.patch_size),
            strides=(s.patch_size, s.patch_size), padding="VALID",
            dtype=self.dtype, name="patch_embed",
        )
        block_cls = nn.remat(Block) if self.remat else Block
        self.blocks = [
            block_cls(s.embed_dim, s.num_heads, s.mlp_ratio, self.dtype,
                      self.gelu_approximate, quant=self.quant,
                      stream_dtype=self.stream_dtype, name=f"block{i}")
            for i in range(s.depth)
        ]
        ln_dtype = None if self.stream_dtype == jnp.float32 else self.stream_dtype
        self.norm = nn.LayerNorm(epsilon=1e-6, dtype=ln_dtype, name="norm")

    def interpolated_pos_embed(self, h: int, w: int) -> jax.Array:
        """Bicubic-resize the patch position table to an (h, w) grid and
        re-attach the cls position (vit.py:294-301)."""
        g = self.spec.pretrained_grid
        cls_pos = self.pos_embed[:, :1]
        patch_pos = self.pos_embed[:, 1:].reshape(1, g, g, self.spec.embed_dim)
        if (h, w) != (g, g):
            from dupl_tpu.ops.image import resize_bicubic
            patch_pos = resize_bicubic(patch_pos, (h, w))
        patch_pos = patch_pos.reshape(1, h * w, self.spec.embed_dim)
        return jnp.concatenate([cls_pos, patch_pos], axis=1)

    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """x: (B, H, W, 3) -> (cls_token (B, C), patch tokens (B, hw, C),
        aux tokens (B, hw, C))."""
        b, hh, ww, _ = x.shape
        p = self.spec.patch_size
        h, w = hh // p, ww // p
        tokens = self.patch_embed(x).reshape(b, h * w, self.spec.embed_dim)
        tokens = tokens.astype(jnp.float32)
        cls = jnp.broadcast_to(self.cls_token, (b, 1, self.spec.embed_dim))
        x = jnp.concatenate([cls, tokens], axis=1)
        x = (x + self.interpolated_pos_embed(h, w)).astype(self.stream_dtype)

        aux_idx = self.aux_layer % self.spec.depth
        aux = None
        for i, blk in enumerate(self.blocks):
            x = blk(x)
            if i == aux_idx:
                aux = x
        x = self.norm(x)
        if aux_idx == self.spec.depth - 1:
            aux = x  # embeds[-1] is replaced by the normed output (vit.py:325)
        return x[:, 0], x[:, 1:], aux[:, 1:]
