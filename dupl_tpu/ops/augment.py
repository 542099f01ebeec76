"""Device-side strong augmentation.

The reference's strong view (utils/imutils.py:305-317) round-trips every image
through PIL on the host — ``RandAugment(n=5, m=10)`` over a 7-op list
(utils/randomaug.py:161-204: AutoContrast, Equalize, Posterize, Color,
Contrast, Brightness, Sharpness) followed by a horizontal flip — a per-step
host serialisation point.  Here the same ops are batched jnp array code inside
the jitted train step.

Ops work on [0,1] float images (scaled to [0,255] internally to keep PIL's
constants).  The only deliberate deviation from PIL is skipping the uint8
quantisation between chained ops (statistically equivalent augmentation
noise); per-op parity is tested against PIL oracles (tests/test_augment.py).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp


def _grayscale(img255: jax.Array) -> jax.Array:
    """PIL "L" weights."""
    r, g, b = img255[..., 0], img255[..., 1], img255[..., 2]
    return 0.299 * r + 0.587 * g + 0.114 * b


def autocontrast(img255: jax.Array, _v) -> jax.Array:
    """Per-channel linear stretch to [0, 255] (PIL.ImageOps.autocontrast)."""
    lo = jnp.min(img255, axis=(0, 1), keepdims=True)
    hi = jnp.max(img255, axis=(0, 1), keepdims=True)
    scale = 255.0 / jnp.maximum(hi - lo, 1e-5)
    out = (img255 - lo) * scale
    return jnp.where(hi > lo, out, img255)


def equalize(img255: jax.Array, _v) -> jax.Array:
    """Per-channel histogram equalization with PIL's exact LUT rule
    (ImageOps.equalize): step = (total - h[last nonzero]) // 255,
    lut[i] = (step//2 + cumsum_excl(h)[i]) // step; identity when step == 0."""

    def eq_channel(ch):
        q = jnp.clip(ch, 0, 255).astype(jnp.int32)
        hist = jnp.bincount(q.reshape(-1), length=256)
        total = jnp.sum(hist)
        idx = jax.lax.broadcasted_iota(jnp.int32, (256, 1), 0)[:, 0]
        last_nz = jnp.max(jnp.where(hist > 0, idx, -1))
        h_last = hist[jnp.maximum(last_nz, 0)]
        step = (total - h_last) // 255
        cum_excl = jnp.cumsum(hist) - hist
        lut = (step // 2 + cum_excl) // jnp.maximum(step, 1)
        lut = jnp.clip(lut, 0, 255).astype(jnp.float32)
        out = jnp.take(lut, q)
        return jnp.where(step > 0, out, ch)

    return jnp.stack([eq_channel(img255[..., c]) for c in range(3)], axis=-1)


def posterize(img255: jax.Array, v) -> jax.Array:
    """Keep the top ``bits`` bits (PIL.ImageOps.posterize); the reference maps
    magnitude into [0, 6] and clamps bits >= 1 (randomaug.py:92-95)."""
    bits = jnp.maximum(jnp.floor(v), 1.0)
    step = 2.0 ** (8.0 - bits)
    return jnp.floor(jnp.clip(img255, 0, 255) / step) * step


def color(img255: jax.Array, v) -> jax.Array:
    """Saturation: blend with the per-pixel grayscale (PIL ImageEnhance.Color)."""
    gray = _grayscale(img255)[..., None]
    return gray + v * (img255 - gray)


def contrast(img255: jax.Array, v) -> jax.Array:
    """Blend with the scalar mean of the grayscale image."""
    mean = jnp.mean(_grayscale(img255))
    return mean + v * (img255 - mean)


def brightness(img255: jax.Array, v) -> jax.Array:
    return img255 * v


def sharpness(img255: jax.Array, v) -> jax.Array:
    """Blend with PIL's SMOOTH filter (3x3 kernel, center 5 / sum 13); PIL
    leaves the 1-px border of the filtered image untouched."""
    k = jnp.asarray([[1, 1, 1], [1, 5, 1], [1, 1, 1]], jnp.float32) / 13.0
    x = img255[None].transpose(0, 3, 1, 2)  # NCHW, depthwise smooth per channel
    sm = jnp.concatenate([
        jax.lax.conv_general_dilated(
            x[:, c:c + 1], k[None, None], (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        for c in range(3)
    ], axis=1)[0].transpose(1, 2, 0)
    h, w, _ = img255.shape
    inner = jnp.pad(jnp.ones((h - 2, w - 2, 1), bool), ((1, 1), (1, 1), (0, 0)))
    sm = jnp.where(inner, sm, img255)
    return sm + v * (img255 - sm)


_OPS = (autocontrast, equalize, posterize, color, contrast, brightness, sharpness)
# (min, max) magnitude ranges from randomaug.augment_list:161-204
_RANGES = ((0, 1), (0, 1), (0, 6), (0.1, 1.9), (0.1, 1.9), (0.1, 1.9), (0.1, 1.9))


# --------------------------------------------------------------------- batched
# Batched forms of every op.  vmap(lax.switch) evaluates ALL branches under a
# batch anyway (different lanes pick different ops), so the fast formulation is
# to run each op batched over the whole batch once per round and select with
# ``where`` — and to avoid scatter-based histograms, whose TPU lowering
# dominated the train step.

def _equalize_batched(img255: jax.Array) -> jax.Array:
    """(B, H, W, 3): PIL-LUT equalize with a comparison-based histogram
    (one-hot reduce instead of scatter — VPU-friendly)."""
    b, h, w, _ = img255.shape
    n = h * w
    q = jnp.clip(img255, 0, 255).astype(jnp.int32).reshape(b, n, 3)
    bins = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 256), 2)

    def histogram(qc):
        """(B, N) -> (B, 256): chunked compare-reduce; bf16 within a chunk
        (counts stay <= 256 so bf16 is exact), f32 across chunks.  Pixels are
        padded with value 256, which matches no bin."""
        chunk = 4096
        npad = -(-n // chunk) * chunk
        qq = jnp.pad(qc, ((0, 0), (0, npad - n)), constant_values=256)
        qq = qq.reshape(b, npad // chunk, chunk)

        def body(c, acc):
            oh = (qq[:, c, :, None] == bins).astype(jnp.bfloat16)
            return acc + jnp.sum(oh, axis=1).astype(jnp.float32)

        return jax.lax.fori_loop(0, npad // chunk, body,
                                 jnp.zeros((b, 256), jnp.float32))

    def apply_lut(qc, lut):
        """(B, N) pixels through a per-image (B, 256) LUT WITHOUT a gather
        (per-pixel table gathers dominated the strong-aug step): chunked
        compare-select, fused by XLA like the histogram pass.  LUT values
        are exact in bf16 (integers <= 255)."""
        chunk = 4096
        npad = -(-n // chunk) * chunk
        qq = jnp.pad(qc, ((0, 0), (0, npad - n)), constant_values=256)
        qq = qq.reshape(b, npad // chunk, chunk)
        lut16 = lut.astype(jnp.bfloat16)

        def body(c, acc):
            oh = (qq[:, c, :, None] == bins).astype(jnp.bfloat16)
            vals = jnp.einsum("bnk,bk->bn", oh, lut16).astype(jnp.float32)
            return jax.lax.dynamic_update_slice(acc, vals[:, None], (0, c, 0))

        out = jax.lax.fori_loop(0, npad // chunk, body,
                                jnp.zeros((b, npad // chunk, chunk), jnp.float32))
        return out.reshape(b, npad)[:, :n]

    outs = []
    for c in range(3):
        hist = histogram(q[:, :, c])                              # (B, 256)
        total = jnp.sum(hist, axis=1, keepdims=True)
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)
        last_nz = jnp.max(jnp.where(hist > 0, idx, -1), axis=1, keepdims=True)
        h_last = jnp.take_along_axis(hist, jnp.maximum(last_nz, 0), axis=1)
        step = jnp.floor((total - h_last) / 255.0)
        cum_excl = jnp.cumsum(hist, axis=1) - hist
        lut = jnp.floor((jnp.floor(step / 2) + cum_excl) / jnp.maximum(step, 1))
        lut = jnp.clip(lut, 0, 255)
        out = apply_lut(q[:, :, c], lut)
        outs.append(jnp.where(step > 0, out, q[:, :, c].astype(jnp.float32)))
    return jnp.stack(outs, axis=-1).reshape(b, h, w, 3)


def _sharpness_batched(img255: jax.Array, v) -> jax.Array:
    # PIL's SMOOTH kernel [[1,1,1],[1,5,1],[1,1,1]]/13 = (3x3 box + 4·δ)/13:
    # the box is separable into two 1-D convs, and the single-channel 2-D
    # conv formulation (which cannot use the MXU) was a strong-aug hot spot
    b, h, w, _ = img255.shape
    x = img255.transpose(0, 3, 1, 2).reshape(b * 3, 1, h, w)
    ones3 = jnp.ones((1, 1, 3, 1), jnp.float32)

    def conv1d(z, kk):
        return jax.lax.conv_general_dilated(
            z, kk, (1, 1), "SAME", dimension_numbers=("NCHW", "OIHW", "NCHW"))

    box = conv1d(conv1d(x, ones3), ones3.transpose(0, 1, 3, 2))
    sm = (box + 4.0 * x) / 13.0
    sm = sm.reshape(b, 3, h, w).transpose(0, 2, 3, 1)
    inner = jnp.pad(jnp.ones((1, h - 2, w - 2, 1), bool),
                    ((0, 0), (1, 1), (1, 1), (0, 0)))
    sm = jnp.where(inner, sm, img255)
    return sm + v * (img255 - sm)


def _batched_ops(img255: jax.Array, vals) -> jax.Array:
    """All 7 ops over the batch; returns (7, B, H, W, 3)."""
    lo = jnp.min(img255, axis=(1, 2), keepdims=True)
    hi = jnp.max(img255, axis=(1, 2), keepdims=True)
    auto = jnp.where(hi > lo, (img255 - lo) * (255.0 / jnp.maximum(hi - lo, 1e-5)),
                     img255)
    eq = _equalize_batched(img255)
    post = posterize(img255, vals[2])
    gray = _grayscale(img255)[..., None]
    col = gray + vals[3] * (img255 - gray)
    mean = jnp.mean(gray, axis=(1, 2, 3), keepdims=True)
    con = mean + vals[4] * (img255 - mean)
    bri = img255 * vals[5]
    sharp = _sharpness_batched(img255, vals[6])
    return jnp.stack([auto, eq, post, col, con, bri, sharp])


@functools.partial(jax.jit, static_argnames=("n", "m"))
def rand_augment(rng: jax.Array, images01: jax.Array, n: int = 5, m: int = 10) -> jax.Array:
    """Batched RandAugment: per image, ``n`` ops sampled with replacement from
    the 7-op list at magnitude ``m``/30 (randomaug.RandAugment:253-265).

    images01: (B, H, W, 3) in [0,1].  Returns [0,1] images.
    """
    b = images01.shape[0]
    img = images01 * 255.0
    vals = jnp.asarray(
        [(m / 30.0) * (hi - lo) + lo for lo, hi in _RANGES], jnp.float32
    )

    for _ in range(n):
        rng, sub = jax.random.split(rng)
        ops = jax.random.randint(sub, (b,), 0, len(_OPS))
        all_ops = jnp.clip(_batched_ops(img, vals), 0.0, 255.0)  # (7,B,H,W,3)
        sel = jax.nn.one_hot(ops, len(_OPS), axis=0,
                             dtype=img.dtype)[..., None, None, None]
        img = jnp.sum(all_ops * sel, axis=0)

    return img / 255.0


def strong_augment(rng: jax.Array, images01: jax.Array, n: int = 5, m: int = 10) -> jax.Array:
    """RandAugment + horizontal flip — the full strong perturbation of
    ``augment_data_strong`` (imutils.py:305-317).  Input/output [0,1]."""
    img = rand_augment(rng, images01, n, m)
    return img[:, :, ::-1, :]
