"""Device RandAugment ops vs PIL oracles (reference op list:
utils/randomaug.py:161-204 via PIL.ImageOps / ImageEnhance)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from PIL import Image, ImageEnhance, ImageOps

from dupl_tpu.ops import augment


@pytest.fixture
def img255(rng):
    return (rng.rand(32, 32, 3) * 255).astype(np.float32)


def _pil(img255):
    return Image.fromarray(img255.astype(np.uint8))


def test_brightness(img255):
    ours = np.asarray(augment.brightness(jnp.asarray(img255), 0.7))
    ref = np.asarray(ImageEnhance.Brightness(_pil(img255)).enhance(0.7), np.float32)
    assert np.abs(ours - ref).max() <= 2.0  # uint8 input rounding


def test_contrast(img255):
    ours = np.asarray(augment.contrast(jnp.asarray(img255), 0.7))
    ref = np.asarray(ImageEnhance.Contrast(_pil(img255)).enhance(0.7), np.float32)
    assert np.abs(ours - ref).mean() <= 1.5


def test_color(img255):
    ours = np.asarray(augment.color(jnp.asarray(img255), 0.7))
    ref = np.asarray(ImageEnhance.Color(_pil(img255)).enhance(0.7), np.float32)
    assert np.abs(ours - ref).mean() <= 1.5


def test_posterize(img255):
    ours = np.asarray(augment.posterize(jnp.asarray(img255), 2.0))
    ref = np.asarray(ImageOps.posterize(_pil(img255), 2), np.float32)
    assert np.abs(ours - ref).max() <= 1.0


def test_autocontrast(img255):
    ours = np.asarray(augment.autocontrast(jnp.asarray(img255), None))
    ref = np.asarray(ImageOps.autocontrast(_pil(img255)), np.float32)
    assert np.abs(ours - ref).mean() <= 2.0


def test_equalize_close_to_pil(img255):
    ours = np.asarray(augment.equalize(jnp.asarray(img255), None))
    ref = np.asarray(ImageOps.equalize(_pil(img255)), np.float32)
    # PIL-exact LUT rule up to uint8 input rounding
    assert np.abs(ours - ref).mean() <= 2.0


def test_sharpness_interior_border(img255):
    ours = np.asarray(augment.sharpness(jnp.asarray(img255), 0.7))
    ref = np.asarray(ImageEnhance.Sharpness(_pil(img255)).enhance(0.7), np.float32)
    assert np.abs(ours - ref).mean() <= 1.5
    # PIL leaves the 1px border unfiltered
    np.testing.assert_allclose(ours[0], img255[0], atol=1e-3)


def test_equalize_batched_matches_single(rng):
    from dupl_tpu.ops.augment import _equalize_batched
    imgs = (rng.rand(3, 24, 24, 3) * 255).astype(np.float32)
    batched = np.asarray(_equalize_batched(jnp.asarray(imgs)))
    for i in range(3):
        single = np.asarray(augment.equalize(jnp.asarray(imgs[i]), None))
        np.testing.assert_allclose(batched[i], single, atol=1e-3)


def test_batched_ops_match_single(rng):
    from dupl_tpu.ops.augment import _batched_ops, _OPS, _RANGES
    imgs = (rng.rand(2, 24, 24, 3) * 255).astype(np.float32)
    m = 10
    vals = np.asarray([(m / 30.0) * (hi - lo) + lo for lo, hi in _RANGES],
                      np.float32)
    allb = np.asarray(_batched_ops(jnp.asarray(imgs), jnp.asarray(vals)))
    for k, f in enumerate(_OPS):
        for i in range(2):
            single = np.asarray(f(jnp.asarray(imgs[i]), vals[k]))
            np.testing.assert_allclose(allb[k, i], single, atol=1e-2,
                                       err_msg=f"op {f.__name__}")


def test_strong_augment_batch(rng):
    imgs = rng.rand(3, 32, 32, 3).astype(np.float32)
    out = augment.strong_augment(jax.random.PRNGKey(0), jnp.asarray(imgs), n=3, m=10)
    out = np.asarray(out)
    assert out.shape == imgs.shape
    assert np.all(out >= 0) and np.all(out <= 1.0)
    # includes the horizontal flip
    out2 = augment.rand_augment(jax.random.PRNGKey(0), jnp.asarray(imgs), n=3, m=10)
    np.testing.assert_allclose(out, np.asarray(out2)[:, :, ::-1], atol=1e-6)
    # per-sample op draws differ
    assert not np.allclose(out[0], out[1])
