"""Image-space primitives shared across the pipeline.

All tensors are NHWC unless stated otherwise (TPU-friendly layout: the channel
axis lands on the 128-wide lane dimension).  The reference is NCHW torch code;
layout is an implementation choice, semantics are identical.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

# ImageNet statistics in [0,255] units (reference: datasets/transforms.py:45,
# utils/imutils.py:17).
IMAGENET_MEAN = (123.675, 116.28, 103.53)
IMAGENET_STD = (58.395, 57.12, 57.375)


def resize_bilinear(x: jax.Array, size: Tuple[int, int], *, batch_dims: int = 1) -> jax.Array:
    """Bilinear resize with half-pixel centers over the two dims after
    ``batch_dims`` — matches torch ``F.interpolate(mode='bilinear',
    align_corners=False)`` used throughout the reference.

    ``antialias=False`` is semantic, not cosmetic: torch does not antialias,
    and jax's default (antialias on downscale) diverges by ~0.2 absolute on a
    0.5x downscale — which hits multi-scale CAM (scale 0.5), PAR's
    down_scale=2 input, and eval resizing (verified by
    tests/test_reference_parity.py)."""
    shape = x.shape[:batch_dims] + tuple(size) + x.shape[batch_dims + 2:]
    return jax.image.resize(x, shape, method="bilinear", antialias=False)


def resize_nearest(x: jax.Array, size: Tuple[int, int], *, batch_dims: int = 1) -> jax.Array:
    shape = x.shape[:batch_dims] + tuple(size) + x.shape[batch_dims + 2:]
    return jax.image.resize(x, shape, method="nearest")


def _cubic_kernel(t: jax.Array, a: float = -0.75) -> jax.Array:
    """Cubic convolution kernel with torch's A = -0.75 (jax's ``cubic`` uses
    the Keys kernel with A = -0.5, which is NOT what torch bicubic computes)."""
    at = jnp.abs(t)
    near = ((a + 2.0) * at - (a + 3.0)) * at * at + 1.0
    far = a * (((at - 5.0) * at + 8.0) * at - 4.0)
    return jnp.where(at <= 1.0, near, jnp.where(at < 2.0, far, 0.0))


def _bicubic_weights(in_size: int, out_size: int) -> jax.Array:
    """(out, in) sampling matrix for 1-D torch-style bicubic: half-pixel
    centers, 4 taps, indices clamped to the border (replicate)."""
    scale = in_size / out_size
    src = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
    i0 = jnp.floor(src).astype(jnp.int32)
    w = jnp.zeros((out_size, in_size), jnp.float32)
    rows = jnp.arange(out_size)
    for k in range(-1, 3):
        idx = jnp.clip(i0 + k, 0, in_size - 1)
        w = w.at[rows, idx].add(_cubic_kernel(src - (i0 + k).astype(jnp.float32)))
    return w


def resize_bicubic(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Bicubic resize matching torch ``F.interpolate(mode='bicubic',
    align_corners=False)`` exactly (A = -0.75, no antialias, border-clamped
    taps).  x: (B, H, W, C).  Used for ViT positional-embedding interpolation
    (reference: model/backbone/vit.py:294-297) where the kernel-shape
    difference vs jax's ``cubic`` shifts every token by ~6% relative."""
    wh = _bicubic_weights(x.shape[1], size[0]).astype(x.dtype)
    ww = _bicubic_weights(x.shape[2], size[1]).astype(x.dtype)
    return jnp.einsum("oh,bhwc,pw->bopc", wh, x, ww)


def denormalize(x: jax.Array) -> jax.Array:
    """ImageNet-normalised float image -> [0,1] floats.

    The reference's ``denormalize_img2`` (utils/imutils.py:27-31) round-trips
    through uint8; we keep floats (the uint8 cast only mattered for PIL)."""
    mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
    std = jnp.asarray(IMAGENET_STD, x.dtype)
    return (x * std + mean) / 255.0


def normalize(x01: jax.Array) -> jax.Array:
    """[0,1] floats -> ImageNet-normalised."""
    mean = jnp.asarray(IMAGENET_MEAN, x01.dtype)
    std = jnp.asarray(IMAGENET_STD, x01.dtype)
    return (x01 * 255.0 - mean) / std


def prepare_inputs(image: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Accept a training image batch in either wire format and return
    ``(imagenet_normalised_f32, denormalised_01)``.

    Two formats:
    - float32, already ImageNet-normalised on the host (the reference's
      datasets/transforms.py:45-52 path) — passed through; the [0,1] view is
      recovered via :func:`denormalize`.
    - **uint8 [0,255]** (production wire format): 4x smaller host->device
      transfers.  Normalisation runs the same (u8 - mean) / std here in
      float32 (the host numpy path rounds once through float64, so the two
      formats agree to <=1 ulp); the [0,1] view is the exact u8/255 instead
      of a normalise/denormalise round-trip.

    Consumers that only need one of the two views rely on XLA dead-code
    elimination (both are elementwise chains off the same input).
    """
    if image.dtype == jnp.uint8:
        f = image.astype(jnp.float32)
        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
        std = jnp.asarray(IMAGENET_STD, jnp.float32)
        return (f - mean) / std, f / 255.0
    return image, denormalize(image)


def box_mask(img_box: jax.Array, height: int, width: int) -> jax.Array:
    """(B, 4) [h0, h1, w0, w1] -> (B, H, W) bool mask of the valid crop region.

    Device-side replacement for the reference's per-image Python slicing loop
    (utils/cam_helper.py:26-28)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, height, 1), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, width), 2)
    h0 = img_box[:, 0][:, None, None]
    h1 = img_box[:, 1][:, None, None]
    w0 = img_box[:, 2][:, None, None]
    w1 = img_box[:, 3][:, None, None]
    return (rows >= h0) & (rows < h1) & (cols >= w0) & (cols < w1)


def scale_box(img_box: jax.Array, factor_num: int, factor_den: int) -> jax.Array:
    """Rescale integer box coordinates by factor_num/factor_den."""
    return img_box * factor_num // factor_den


def spatial_minmax_norm(cam: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Per-(sample, class) spatial min-max normalisation, exactly the
    ``adaptive_max_pool2d`` trick of the reference (utils/cam_helper.py:196-202):
    shift by the spatial min, divide by the (shifted) spatial max + eps.

    cam: (..., H, W, C).
    """
    mn = jnp.min(cam, axis=(-3, -2), keepdims=True)
    cam = cam - mn
    mx = jnp.max(cam, axis=(-3, -2), keepdims=True)
    return cam / (mx + eps)


@functools.partial(jax.jit, static_argnames=("dilations",))
def dilated_neighbors(x: jax.Array, dilations: Sequence[int]) -> jax.Array:
    """Gather the 8-connected neighborhood at each dilation with replicate
    padding (reference: model/PAR.py:39-49, cross-correlation with one-hot 3x3
    kernels over replicate-padded input).

    x: (B, H, W, C) -> (B, H, W, K, C) with K = 8 * len(dilations).

    Implemented as static slices of a single replicate-padded copy — pure XLA
    data movement that fuses with downstream elementwise math.
    """
    b, h, w, c = x.shape
    dmax = max(dilations)
    xp = jnp.pad(x, ((0, 0), (dmax, dmax), (dmax, dmax), (0, 0)), mode="edge")
    offsets = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]
    taps = []
    for d in dilations:
        for dy, dx in offsets:
            taps.append(
                jax.lax.dynamic_slice(
                    xp, (0, dmax + dy * d, dmax + dx * d, 0), (b, h, w, c)
                )
            )
    return jnp.stack(taps, axis=3)
