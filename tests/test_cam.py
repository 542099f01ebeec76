"""Pseudo-label engine parity (reference: utils/cam_helper.py)."""

import numpy as np
import jax.numpy as jnp

from dupl_tpu.ops import cam as cam_ops
from dupl_tpu.ops import image as image_ops


def _ref_cam_to_label(cam_nchw, cls_label, img_box, bkg, high, low, ignore_mid):
    """Numpy oracle for cam_helper.cam_to_label[_dynamic_cls]:8-55."""
    b, c, h, w = cam_nchw.shape
    valid = cls_label[:, :, None, None] * cam_nchw
    value = valid.max(axis=1)
    label = valid.argmax(axis=1) + 1
    label[value <= bkg] = 0
    if ignore_mid:
        high = np.broadcast_to(np.reshape(high, (-1, 1, 1)), value.shape)
        label[value <= high] = 255
        label[value <= low] = 0
    out = np.full_like(label, 255)
    for i, (h0, h1, w0, w1) in enumerate(img_box):
        out[i, h0:h1, w0:w1] = label[i, h0:h1, w0:w1]
    return out


def test_cam_to_label_static_and_dynamic(rng):
    b, c, h, w = 3, 20, 16, 16
    cam = rng.rand(b, c, h, w).astype(np.float32)
    cls_label = (rng.rand(b, c) > 0.7).astype(np.float32)
    cls_label[:, 0] = 1  # ensure at least one class
    box = np.array([[2, 14, 1, 15], [0, 16, 0, 16], [5, 9, 5, 9]], np.int32)

    for high in (0.7, rng.rand(b).astype(np.float32) * 0.3 + 0.5):
        ref = _ref_cam_to_label(cam, cls_label, box, 0.5, high, 0.25, True)
        _, ours = cam_ops.cam_to_label(
            jnp.asarray(cam.transpose(0, 2, 3, 1)), jnp.asarray(cls_label),
            bkg_thre=0.5, img_box=jnp.asarray(box), ignore_mid=True,
            high_thre=high, low_thre=0.25, ignore_index=255,
        )
        np.testing.assert_array_equal(np.asarray(ours), ref)


def test_label_to_aff_mask(rng):
    label = rng.choice([0, 1, 2, 255], size=(2, 4, 4)).astype(np.int32)
    ours = np.asarray(cam_ops.label_to_aff_mask(jnp.asarray(label)))

    b, h, w = label.shape
    flat = label.reshape(b, -1)
    ref = (flat[:, :, None] == flat[:, None, :]).astype(np.int64)
    for i in range(b):
        ref[i][:, flat[i] == 255] = 255
        ref[i][flat[i] == 255, :] = 255
    ref[:, range(h * w), range(h * w)] = 255
    np.testing.assert_array_equal(ours, ref)


def test_spatial_minmax_norm():
    x = np.arange(2 * 4 * 4 * 3, dtype=np.float32).reshape(2, 4, 4, 3)
    out = np.asarray(image_ops.spatial_minmax_norm(jnp.asarray(x)))
    for b in range(2):
        for c in range(3):
            ch = x[b, :, :, c]
            expect = (ch - ch.min()) / (ch.max() - ch.min() + 1e-5)
            np.testing.assert_allclose(out[b, :, :, c], expect, rtol=1e-5)


def test_multi_scale_cam_fusion(rng):
    """Fusion semantics: flip-max per scale, ReLU, sum over scales, minmax."""
    b, h, w, c = 2, 16, 16, 5

    def cam_fn(x):
        # deterministic pseudo-CAM: channel-wise linear maps of the input mean
        m = jnp.mean(x, axis=-1, keepdims=True)
        sizes = (x.shape[1] // 4, x.shape[2] // 4)
        small = image_ops.resize_bilinear(m, sizes)
        cam = jnp.concatenate([small * (i + 1) - 0.5 * i for i in range(c)], axis=-1)
        return cam, cam * 0.5

    inputs = rng.rand(b, h, w, 3).astype(np.float32)
    fused, fused_aux = cam_ops.multi_scale_cam(cam_fn, jnp.asarray(inputs), (1.0, 0.5, 1.5))
    assert fused.shape == (b, h, w, c)
    out = np.asarray(fused)
    # min-max normalised per (b, c)
    assert np.all(out >= 0) and np.all(out <= 1.0)
    mins = out.min(axis=(1, 2))
    np.testing.assert_allclose(mins, 0.0, atol=1e-6)

    # oracle: recompute by hand
    acc = np.zeros((b, h, w, c), np.float32)
    for s in (1.0, 0.5, 1.5):
        xs = inputs if s == 1.0 else np.asarray(
            image_ops.resize_bilinear(jnp.asarray(inputs), (int(s * h), int(s * w))))
        both = np.concatenate([xs, xs[:, :, ::-1]], axis=0)
        camv, _ = cam_fn(jnp.asarray(both))
        camv = np.asarray(image_ops.resize_bilinear(camv, (h, w)))
        merged = np.maximum(camv[:b], camv[b:, :, ::-1])
        acc += np.maximum(merged, 0)
    mn = acc.min(axis=(1, 2), keepdims=True)
    acc = acc - mn
    mx = acc.max(axis=(1, 2), keepdims=True)
    expect = acc / (mx + 1e-5)
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-5)


def test_box_mask():
    box = np.array([[1, 3, 0, 2]], np.int32)
    m = np.asarray(image_ops.box_mask(jnp.asarray(box), 4, 4))
    expect = np.zeros((1, 4, 4), bool)
    expect[0, 1:3, 0:2] = True
    np.testing.assert_array_equal(m, expect)


def test_merge_at_par_resolution_label_agreement(rng):
    """The inference pipeline merges multi-scale CAMs directly at the PAR
    refinement resolution (input/2) instead of the input resolution the
    reference uses (whose merge is immediately downscaled again by
    refine_cams_with_bkg).  The deviation is a resampling-order effect only;
    the refined pseudo-labels must agree >99%."""
    import jax
    from dupl_tpu.ops import par as par_ops

    b, h = 2, 128
    # smooth synthetic images: low-frequency noise upsampled
    base = rng.rand(b, 8, 8, 3).astype(np.float32)
    imgs01 = np.asarray(image_ops.resize_bilinear(jnp.asarray(base), (h, h)))
    proj = jnp.asarray(rng.randn(3, 6).astype(np.float32))

    def cam_fn(z):
        # patch-res "CAM": 16x16 mean-pool + fixed projection (flip-consistent)
        bb, hh, ww, _ = z.shape
        p = z.reshape(bb, hh // 16, 16, ww // 16, 16, 3).mean(axis=(2, 4))
        cam = jax.nn.relu(jnp.einsum("bhwc,cf->bhwf", p, proj))
        return cam, cam

    def full_fn(z):
        cam, aux = cam_fn(z)
        return cam, cam, aux  # "out" stands in as any pytree

    cls = jnp.ones((b, 6), jnp.float32)
    box = jnp.asarray([[0, h, 0, h]] * b, jnp.int32)

    def par_fn(im, masks):
        return par_ops.par_refine(im, masks, num_iter=2, use_pallas=False)

    labels = {}
    for ms in (None, (h // 2, h // 2)):
        cams, _, _ = cam_ops.multi_scale_cam_with_outputs(
            full_fn, cam_fn, jnp.asarray(imgs01), (1.0, 0.5),
            with_aux=False, merge_size=ms)
        labels[ms] = np.asarray(cam_ops.refine_cams_with_bkg(
            par_fn, jnp.asarray(imgs01), cams * cls[:, None, None, :], cls,
            high_thre=0.7, low_thre=0.25, img_box=box, down_scale=2))

    agree = (labels[None] == labels[(h // 2, h // 2)]).mean()
    assert agree > 0.99, f"merge-resolution label agreement {agree:.4f}"



def test_class_budget_exact(rng):
    """Class-axis compaction (the batched form of the reference's per-image
    valid-key gather, cam_helper.py:413) is EXACT when every image's present
    classes fit the budget, and falls back to the full axis when they don't."""
    import jax
    from dupl_tpu.ops import par as par_ops

    b, h, c = 3, 64, 12
    base = rng.rand(b, 8, 8, 3).astype(np.float32)
    imgs01 = jnp.asarray(image_ops.resize_bilinear(jnp.asarray(base), (h, h)))
    cams = jnp.asarray(rng.rand(b, h, h, c).astype(np.float32))
    cls = (rng.rand(b, c) > 0.6).astype(np.float32)
    cls[:, 0] = 1  # at least one present
    box = jnp.asarray([[0, h, 0, h]] * b, jnp.int32)

    def par_fn(im, masks):
        return par_ops.par_refine(im, masks, num_iter=2, use_pallas=False)

    kw = dict(high_thre=0.7, low_thre=0.25, img_box=box, down_scale=2)
    full = np.asarray(cam_ops.refine_cams_with_bkg(
        par_fn, imgs01, cams * jnp.asarray(cls)[:, None, None, :],
        jnp.asarray(cls), **kw))
    # budget comfortably above the max present count: exact
    budget = int(cls.sum(1).max()) + 1
    compact = np.asarray(cam_ops.refine_cams_with_bkg(
        par_fn, imgs01, cams * jnp.asarray(cls)[:, None, None, :],
        jnp.asarray(cls), class_budget=budget, **kw))
    np.testing.assert_array_equal(full, compact)
    # budget below the max present count: cond falls back, still exact
    tight = np.asarray(cam_ops.refine_cams_with_bkg(
        par_fn, imgs01, cams * jnp.asarray(cls)[:, None, None, :],
        jnp.asarray(cls), class_budget=max(2, budget - 3), **kw))
    np.testing.assert_array_equal(full, tight)


def test_refine_view_axis_matches_per_view(rng):
    """(V, B, ...) CAM views through ONE refine call (branch axis folded into
    the PAR class axis, shared per-image affinity) label exactly like refining
    each view separately — with and without class-axis compaction."""
    from dupl_tpu.ops import par as par_ops

    v, b, h, c = 2, 3, 64, 6
    base = rng.rand(b, 8, 8, 3).astype(np.float32)
    imgs01 = jnp.asarray(image_ops.resize_bilinear(jnp.asarray(base), (h, h)))
    cams = jnp.asarray(rng.rand(v, b, h, h, c).astype(np.float32))
    cls = (rng.rand(b, c) > 0.4).astype(np.float32)
    cls[:, 0] = 1
    clsj = jnp.asarray(cls)
    box = jnp.asarray([[0, h, 0, h // 2]] * b, jnp.int32)

    def par_fn(im, masks):
        return par_ops.par_refine(im, masks, num_iter=2, use_pallas=False)

    valid = cams * clsj[None, :, None, None, :]
    for budget in (None, int(cls.sum(1).max()) + 1):
        kw = dict(high_thre=0.7, low_thre=0.25, img_box=box, down_scale=2,
                  class_budget=budget)
        stacked = np.asarray(cam_ops.refine_cams_with_bkg(
            par_fn, imgs01, valid, clsj, **kw))
        assert stacked.shape == (v, b, h, h)
        for vi in range(v):
            single = np.asarray(cam_ops.refine_cams_with_bkg(
                par_fn, imgs01, valid[vi], clsj, **kw))
            np.testing.assert_array_equal(stacked[vi], single)
