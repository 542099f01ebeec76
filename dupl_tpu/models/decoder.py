"""Segmentation decoders (reference: model/decoder/conv_head.py).

The reference ships ``LargeFOV`` (used) and ``ASPP`` (unused but part of the
API surface); its ``model/decoder/__init__.py`` is broken-empty — a bug we do
not replicate (SURVEY.md §7 "Reference bugs to not replicate")."""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


class LargeFOV(nn.Module):
    """3x3 dil-5 conv -> ReLU -> 3x3 dil-5 conv -> ReLU -> 1x1 conv to classes
    (conv_head.py:11-41).  All three convs are bias-free, exactly like the
    reference's ``conv3x3``/``conv1x1`` helpers (conv_head.py:3-9)."""

    out_planes: int
    embed_dim: int = 512
    dilation: int = 5
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        d = self.dilation
        x = nn.Conv(self.embed_dim, (3, 3), kernel_dilation=(d, d),
                    padding=d, use_bias=False, dtype=self.dtype, name="conv6")(x)
        x = nn.relu(x)
        x = nn.Conv(self.embed_dim, (3, 3), kernel_dilation=(d, d),
                    padding=d, use_bias=False, dtype=self.dtype, name="conv7")(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_planes, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv8")(x)
        return x.astype(jnp.float32)


class ASPP(nn.Module):
    """Sum of parallel 3x3 atrous convs (conv_head.py:43-58)."""

    out_planes: int
    atrous_rates: Sequence[int] = (6, 12, 18, 24)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        out = None
        for i, rate in enumerate(self.atrous_rates):
            y = nn.Conv(self.out_planes, (3, 3), kernel_dilation=(rate, rate),
                        padding=rate, use_bias=True, dtype=self.dtype, name=f"c{i}")(x)
            out = y if out is None else out + y
        return out.astype(jnp.float32)
