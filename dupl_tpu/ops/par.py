"""PAR — pixel-adaptive refinement (reference: model/PAR.py).

Non-learned local-affinity propagation: for each pixel, 8 neighbors at each of
six dilations (48 taps, replicate padding).  RGB affinity
``softmax_k(-(|Δrgb| / std / w1)²)`` (channel-averaged) plus ``w2`` times a
constant position affinity, then ``num_iter`` rounds of
``mask <- Σ_k neighbor_k(mask) * aff_k``.

The reference wraps this in per-image Python loops (utils/cam_helper.py:412-425);
here everything is batched.  Two implementations:

* :func:`par_refine` — pure XLA.  The 48 taps are static slices of one padded
  array and the propagation accumulates tap-by-tap, so XLA fuses the whole
  update into elementwise code without materialising the (B, H, W, 48, C)
  neighbor tensor.
* a Pallas kernel (``dupl_tpu.ops.par_pallas``) that keeps masks + affinity in
  VMEM across all iterations for HBM-bound sizes.
"""

from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

# 8-connected neighborhood; diagonal taps are at distance sqrt(2)*d.
OFFSETS: Tuple[Tuple[int, int], ...] = (
    (-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1),
)
_DIAGONAL = (True, False, True, False, False, True, False, True)


def position_affinity(dilations: Sequence[int], w1: float = 0.3, w2: float = 0.01) -> jnp.ndarray:
    """The constant position-affinity term (reference: model/PAR.py:51-62,82-85).

    The reference builds a (48,) distance vector (sqrt(2)*d on diagonals, d on
    axis taps), computes ``softmax(-(dist / (std + 1e-8) / w1)²)`` with the
    unbiased std of that vector, and mixes it in with weight w2.  It is input
    independent, so we precompute ``w2 * softmax(...)`` once.
    """
    dist = []
    for d in dilations:
        for diag in _DIAGONAL:
            dist.append((math.sqrt(2.0) if diag else 1.0) * d)
    dist = jnp.asarray(dist, jnp.float32)
    std = jnp.std(dist, ddof=1)
    logits = -((dist / (std + 1e-8) / w1) ** 2)
    return w2 * jax.nn.softmax(logits)


def _taps(xp: jax.Array, shape: Tuple[int, ...], dmax: int, dilations: Sequence[int]):
    """Yield the 48 neighbor views as static slices of the padded array."""
    b, h, w, c = shape
    for d in dilations:
        for dy, dx in OFFSETS:
            yield jax.lax.dynamic_slice(xp, (0, dmax + dy * d, dmax + dx * d, 0), shape)


def rgb_affinity(
    imgs: jax.Array,
    dilations: Sequence[int] = (1, 2, 4, 8, 12, 24),
    w1: float = 0.3,
    w2: float = 0.01,
    compute_dtype: str = "float32",
) -> jax.Array:
    """Per-pixel 48-tap affinity (reference: model/PAR.py:69-85).

    imgs: (B, H, W, 3) denormalised [0,1].  Returns (B, H, W, 48) float32 with
    ``softmax_k(rgb term) + w2 * softmax_k(position term)`` (rows sum to 1+w2).

    Streaming two-pass formulation: accumulate Σx and Σx² over taps for the
    unbiased std, then a second pass for the softmax — never materialises the
    (B, H, W, 48, 3) tensor outside of XLA fusion.

    ``compute_dtype="bfloat16"`` reads the padded tap source in bf16 (half
    the dominant HBM traffic of the 96 tap reads) while every reduction —
    Σx/Σx², the z² channel mean, the softmax — accumulates in f32; pixel
    values in [0, 1] lose <0.4% to the cast, argmax-stable downstream.
    """
    imgs = imgs.astype(jnp.float32)
    b, h, w, c = imgs.shape
    cdt = jnp.dtype(compute_dtype)
    k = 8 * len(dilations)
    dmax = max(dilations)
    xp = jnp.pad(imgs, ((0, 0), (dmax, dmax), (dmax, dmax), (0, 0)),
                 mode="edge").astype(cdt)
    shape = (b, h, w, c)

    s1 = jnp.zeros(shape, jnp.float32)
    s2 = jnp.zeros(shape, jnp.float32)
    for t in _taps(xp, shape, dmax, dilations):
        t = t.astype(jnp.float32)
        s1 = s1 + t
        s2 = s2 + t * t
    mean = s1 / k
    var = jnp.maximum(s2 - k * mean * mean, 0.0) / (k - 1)
    inv = 1.0 / ((jnp.sqrt(var) + 1e-8) * w1)  # (B,H,W,3)

    imgs_c = imgs.astype(cdt)
    logits = []
    for t in _taps(xp, shape, dmax, dilations):
        z = jnp.abs(t - imgs_c).astype(jnp.float32) * inv
        logits.append(-jnp.mean(z * z, axis=-1))  # channel mean -> (B,H,W)
    logits = jnp.stack(logits, axis=-1)  # (B,H,W,48)
    aff = jax.nn.softmax(logits, axis=-1)
    return aff + position_affinity(dilations, w1, w2)[None, None, None, :]


def propagate(
    masks: jax.Array,
    aff: jax.Array,
    dilations: Sequence[int],
    num_iter: int,
) -> jax.Array:
    """``num_iter`` rounds of mask <- Σ_k neighbor_k(mask) * aff_k
    (reference: model/PAR.py:87-89)."""
    b, h, w, c = masks.shape
    dmax = max(dilations)
    pad = ((0, 0), (dmax, dmax), (dmax, dmax), (0, 0))
    aff_taps = [aff[..., i:i + 1] for i in range(aff.shape[-1])]

    def body(_, m):
        mp = jnp.pad(m, pad, mode="edge")
        acc = jnp.zeros_like(m)
        for a, t in zip(aff_taps, _taps(mp, (b, h, w, c), dmax, dilations)):
            acc = acc + t * a
        return acc

    return jax.lax.fori_loop(0, num_iter, body, masks)


def par_refine(
    imgs: jax.Array,
    masks: jax.Array,
    dilations: Sequence[int] = (1, 2, 4, 8, 12, 24),
    num_iter: int = 10,
    w1: float = 0.3,
    w2: float = 0.01,
    use_pallas: bool = None,
    compute_dtype: str = "float32",
) -> jax.Array:
    """Full PAR forward: affinity from ``imgs`` then ``num_iter`` propagation
    steps on ``masks`` (both (B, H, W, ·), same spatial size).

    On TPU the propagation runs as the Pallas kernel
    (``dupl_tpu.ops.par_pallas``); elsewhere (and under ``use_pallas=False``)
    the XLA formulation is used — both are exact to each other.

    ``use_pallas=None`` resolves against the kernel platform HERE, outside
    the jit boundary: the inner jit caches on the resolved boolean, so a
    ``force_kernel_platform`` export override can never be served a stale
    trace recorded under the other backend."""
    if use_pallas is None:
        from dupl_tpu.utils.platform import kernel_platform
        use_pallas = kernel_platform() == "tpu"
    return _par_refine(imgs, masks, tuple(dilations), num_iter, w1, w2,
                       use_pallas, compute_dtype)


@functools.partial(
    jax.jit, static_argnames=("dilations", "num_iter", "w1", "w2",
                              "use_pallas", "compute_dtype"))
def _par_refine(
    imgs: jax.Array,
    masks: jax.Array,
    dilations: Sequence[int],
    num_iter: int,
    w1: float,
    w2: float,
    use_pallas: bool,
    compute_dtype: str,
) -> jax.Array:
    if use_pallas:
        from dupl_tpu.ops.par_pallas import affinity_pallas, propagate_pallas
        aff = affinity_pallas(imgs, tuple(dilations), w1, w2,
                              row_tile=_row_tile(imgs.shape[1]))
        return propagate_pallas(masks.astype(jnp.float32), aff,
                                tuple(dilations), num_iter,
                                compute_dtype=compute_dtype,
                                aff_layout="bkhw")
    aff = rgb_affinity(imgs, dilations, w1, w2, compute_dtype=compute_dtype)
    return propagate(masks.astype(jnp.float32), aff, tuple(dilations), num_iter)


def _row_tile(h: int) -> int:
    """Row-band dividing ``h`` for the affinity kernel (VMEM sizing; ~56 rows
    measures fastest at the 224² refine size, full image for small inputs)."""
    if h <= 64:
        return h
    for d in (64, 56, 48, 32, 112, 96, 80, 128, 16, 8, 4, 2):
        if h % d == 0:
            return d
    return 1
