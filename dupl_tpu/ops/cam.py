"""The pseudo-label engine: CAM -> pixel pseudo-labels.

Covers the live surface of the reference's ``utils/cam_helper.py``:
``cam_to_label`` / ``cam_to_label_dynamic_cls`` banding, ``label_to_aff_mask``,
``multi_scale_cam2_siamese`` fusion/normalisation, and the
``refine_cams_with_*`` PAR drivers — all as batched, jittable device code
(the reference loops over images in Python; here the batch axis is vectorised
and per-image "valid class" gathers become -inf masking over a padded class axis).

Layout: CAMs are (B, H, W, C) with C = num foreground classes; pseudo-labels are
(B, H, W) int32 with 0 = background, c = foreground class c (1-indexed),
``ignore_index`` = uncertain.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from dupl_tpu.ops import image as image_ops


def cam_to_label(
    cam: jax.Array,
    cls_label: jax.Array,
    *,
    bkg_thre: float,
    img_box: Optional[jax.Array] = None,
    ignore_mid: bool = False,
    high_thre=None,
    low_thre=None,
    ignore_index: int = 255,
) -> Tuple[jax.Array, jax.Array]:
    """CAM -> banded pseudo-label (reference: utils/cam_helper.py:8-55).

    cam: (B, H, W, C_fg); cls_label: (B, C_fg) multi-hot.
    ``high_thre`` may be a scalar or a per-sample (B,) array — the latter is the
    ``cam_to_label_dynamic_cls`` variant (class-dependent scheduled threshold).

    Banding order matters and is preserved: argmax+1, then ``<= bkg_thre -> 0``,
    then (if ignore_mid) ``<= high_thre -> ignore`` and ``<= low_thre -> 0``;
    finally everything outside ``img_box`` -> ignore.
    Returns (valid_cam, pseudo_label).
    """
    b, h, w, c = cam.shape
    valid_cam = cam * cls_label[:, None, None, :]
    cam_value = jnp.max(valid_cam, axis=-1)
    label = jnp.argmax(valid_cam, axis=-1).astype(jnp.int32) + 1
    label = jnp.where(cam_value <= bkg_thre, 0, label)
    if ignore_mid:
        high = jnp.asarray(high_thre, cam.dtype)
        if high.ndim == 1:
            high = high[:, None, None]
        label = jnp.where(cam_value <= high, ignore_index, label)
        label = jnp.where(cam_value <= low_thre, 0, label)
    if img_box is not None:
        inside = image_ops.box_mask(img_box, h, w)
        label = jnp.where(inside, label, ignore_index)
    return valid_cam, label


def label_to_aff_mask(cam_label: jax.Array, ignore_index: int = 255) -> jax.Array:
    """Pseudo-label -> (B, HW, HW) pairwise same-class affinity target
    (reference: utils/cam_helper.py:323-335): 1 same class, 0 different,
    ``ignore_index`` on any pair touching an ignored pixel and on the diagonal."""
    b, h, w = cam_label.shape
    flat = cam_label.reshape(b, h * w)
    aff = (flat[:, :, None] == flat[:, None, :]).astype(jnp.int32)
    ign = flat == ignore_index
    aff = jnp.where(ign[:, :, None] | ign[:, None, :], ignore_index, aff)
    eye = jnp.eye(h * w, dtype=bool)
    return jnp.where(eye[None], ignore_index, aff)


def multi_scale_cam(
    cam_fn: Callable[[jax.Array], Tuple[jax.Array, jax.Array]],
    inputs: jax.Array,
    scales: Sequence[float],
    *,
    merge_size: Optional[Tuple[int, int]] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Multi-scale + flip CAM fusion (reference: utils/cam_helper.py:164-204).

    ``cam_fn(x)`` maps an NHWC batch to ``(cam, cam_aux)`` at patch resolution
    (the ``cam_only`` forward).  For every scale the batch is concatenated with
    its horizontal flip so both views ride one big MXU matmul; per scale the CAM
    is resized to the input size and max-merged with the un-flipped copy, ReLU'd,
    summed over scales, then per-(sample, class) min-max normalised.

    ``merge_size`` overrides the merge resolution (default: input size, the
    reference semantics) — see ``multi_scale_cam_with_outputs`` for why
    consumers that immediately downscale (PAR refinement) merge small.

    No-grad by construction: wrap the call in ``jax.lax.stop_gradient`` at the
    call-site (the train step does).
    """
    b, h, w, _ = inputs.shape
    mh, mw = merge_size if merge_size is not None else (h, w)

    def one_scale(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        both = jnp.concatenate([x, x[:, :, ::-1, :]], axis=0)
        cam, cam_aux = cam_fn(both)
        cam = image_ops.resize_bilinear(cam, (mh, mw))
        cam_aux = image_ops.resize_bilinear(cam_aux, (mh, mw))
        cam = jnp.maximum(cam[:b], cam[b:, :, ::-1, :])
        cam_aux = jnp.maximum(cam_aux[:b], cam_aux[b:, :, ::-1, :])
        return jax.nn.relu(cam), jax.nn.relu(cam_aux)

    cam_sum = None
    aux_sum = None
    for s in scales:
        x = inputs if s == 1.0 else image_ops.resize_bilinear(inputs, (int(s * h), int(s * w)))
        cam, cam_aux = one_scale(x)
        cam_sum = cam if cam_sum is None else cam_sum + cam
        aux_sum = cam_aux if aux_sum is None else aux_sum + cam_aux

    return (
        image_ops.spatial_minmax_norm(cam_sum),
        image_ops.spatial_minmax_norm(aux_sum),
    )


def multi_scale_cam_with_outputs(
    full_fn,
    cam_fn,
    inputs: jax.Array,
    scales: Sequence[float],
    *,
    with_aux: bool = True,
    merge_size: Optional[Tuple[int, int]] = None,
    split_flip: bool = False,
):
    """Like :func:`multi_scale_cam`, but the scale-1.0 pass runs the *full*
    student forward (``Student.forward_with_cams``) so inference pipelines get
    cls/seg/fmap for free from the encoder pass the CAM fusion needs anyway.

    Returns (cams, cams_aux, out) where ``out`` is the StudentOut of the
    unflipped scale-1.0 batch.  ``with_aux=False`` skips the aux-CAM fusion
    entirely (cams_aux is None) — inference pipelines that only need the main
    CAM save the full-res aux resize/merge HBM traffic, and XLA dead-codes the
    aux classifier matmuls out of the encoder passes.

    ``merge_size`` overrides the resolution the per-scale CAMs are resized to
    before flip-max/sum/minmax-norm (default: the input size, the reference
    semantics).  Inference pipelines merge directly at the PAR refinement
    resolution (input/2): the full-res merge exists in the reference only to
    be bilinearly downscaled again by ``refine_cams_with_bkg`` — merging at
    the consumer's resolution quarters the merge HBM traffic at a sub-percent
    pseudo-label deviation (bounded by tests/test_cam.py).

    ``split_flip``: run the scale-1.0 UNFLIPPED batch through ``full_fn`` and
    the flipped batch through ``cam_fn`` instead of one 2B concat.  For
    differentiated callers (the fused train step) this keeps the flipped
    view out of the backward pass — under a 2B concat XLA drags the flipped
    half's activations through every saved tensor and the attention backward,
    which costs more than the fused forward saves.  Inference keeps the
    single-concat form (bigger MXU batch, no backward)."""
    b, h, w, _ = inputs.shape
    mh, mw = merge_size if merge_size is not None else (h, w)
    out_keep = None

    def merge(cam):
        cam = image_ops.resize_bilinear(cam, (mh, mw))
        cam = jnp.maximum(cam[:b], cam[b:, :, ::-1, :])
        return jax.nn.relu(cam)

    cam_sum = aux_sum = None
    for s in scales:
        x = inputs if s == 1.0 else image_ops.resize_bilinear(inputs, (int(s * h), int(s * w)))
        if s == 1.0 and split_flip:
            out, cam_u, aux_u = full_fn(x)
            out_keep = out
            cam_f, aux_f = cam_fn(x[:, :, ::-1, :])
            cam = jnp.concatenate([cam_u, cam_f], axis=0)
            cam_aux = jnp.concatenate([aux_u, aux_f], axis=0)
        else:
            both = jnp.concatenate([x, x[:, :, ::-1, :]], axis=0)
            if s == 1.0:
                out, cam, cam_aux = full_fn(both)
                out_keep = jax.tree.map(lambda a: a[:b], out)
            else:
                cam, cam_aux = cam_fn(both)
        cam_sum = merge(cam) if cam_sum is None else cam_sum + merge(cam)
        if with_aux:
            aux_sum = merge(cam_aux) if aux_sum is None else aux_sum + merge(cam_aux)

    return (
        image_ops.spatial_minmax_norm(cam_sum),
        image_ops.spatial_minmax_norm(aux_sum) if with_aux else None,
        out_keep,
    )


def refine_cams_with_bkg(
    par_fn: Callable[[jax.Array, jax.Array], jax.Array],
    images: jax.Array,
    cams: jax.Array,
    cls_label: jax.Array,
    *,
    high_thre,
    low_thre: float,
    img_box: Optional[jax.Array],
    ignore_index: int = 255,
    down_scale: int = 2,
    class_budget: Optional[int] = None,
) -> jax.Array:
    """PAR-refined pseudo-labels with dual background planes
    (reference: utils/cam_helper.py:338-431 — covers both
    ``refine_cams_with_bkg_v2`` (scalar ``high_thre``) and
    ``refine_cams_with_dynamic_thres`` (per-sample (B,) or (B, H, W, 1) map)).

    images: (B, H, W, 3) denormalised [0,1]; cams: (B, H, W, C_fg) — or
    (V, B, H, W, C_fg) for V CAM views of the SAME images (the dual students):
    every view's planes concatenate on the class axis so the whole refinement
    is ONE PAR call whose (expensive, image-only) affinity is computed once
    per image rather than once per view; returns (V, B, H, W) labels then.
    cams are already masked by the class label; cls_label: (B, C_fg).

    Two refinement passes run with a constant background plane at the high and
    low threshold; merge: label = high-pass label, except {high == 0 -> ignore;
    high == 0 and low == 0 -> background}.

    The reference gathers each image's valid classes and softmaxes the
    gathered stack in a per-image Python loop (cam_helper.py:364-372).
    Equivalent batched form here: keep the full (1 + C_fg) class axis and mask
    absent classes to -inf — the masked softmax matches the gathered softmax,
    absent channels become exactly 0 and stay 0 through PAR's linear
    propagation, so the final argmax can never select them and the argmax
    index IS the label (no ``valid_key`` re-indexing).
    """
    b, h, w, _ = images.shape
    hs, ws = h // down_scale, w // down_scale
    squeeze_view = cams.ndim == 4
    if squeeze_view:
        cams = cams[None]
    v = cams.shape[0]

    # Bilinear resize acts per channel and preserves constants, so
    # resize(concat([bkg, cams])) == concat([bkg_small, resize(cams)]):
    # resize the C_fg CAM stack ONCE and synthesise the constant background
    # planes directly at the small size (the concat-then-resize form
    # materialises two full-res (C_fg+1)-channel stacks for nothing).
    high = jnp.asarray(high_thre, cams.dtype)
    if high.ndim <= 1:
        bkg_h_small = jnp.broadcast_to(high.reshape(-1, 1, 1, 1), (b, hs, ws, 1))
    else:
        bkg_h_small = image_ops.resize_bilinear(high, (hs, ws))
    bkg_l_small = jnp.full((b, hs, ws, 1), low_thre, cams.dtype)

    cls_with_bkg = jnp.concatenate(
        [jnp.ones((b, 1), cls_label.dtype), cls_label], axis=-1
    )

    images_small = image_ops.resize_bilinear(images, (hs, ws))
    cams_small = (cams if cams.shape[2:4] == (hs, ws)
                  else image_ops.resize_bilinear(cams, (hs, ws), batch_dims=2))

    # ALL planes — per view a high- and a low-threshold background stack —
    # ride ONE PAR call: propagation is independent per channel, so the 2V
    # stacks concatenate on the class axis (plane order: v0_hi, v0_lo,
    # v1_hi, v1_lo, ...) and the (expensive, image-only) affinity is
    # computed once per image, not once per view or plane.
    def masked_softmax(stack):
        neg_inf = jnp.asarray(-1e30, stack.dtype)
        stack = jnp.where(cls_with_bkg[:, None, None, :] > 0, stack, neg_inf)
        return jax.nn.softmax(stack, axis=-1)

    nclass = cams_small.shape[-1] + 1
    planes = []
    for vi in range(v):
        planes.append(masked_softmax(
            jnp.concatenate([bkg_h_small, cams_small[vi]], axis=-1)))
        planes.append(masked_softmax(
            jnp.concatenate([bkg_l_small, cams_small[vi]], axis=-1)))
    probs = jnp.concatenate(planes, axis=-1)     # (B, hs, ws, 2V * nclass)

    def _per_plane_labels(refined, k):
        """(B, h, w, 2V*k) refined stacks -> high/low argmax labels,
        each (V, B, h, w)."""
        r = refined.reshape(refined.shape[:3] + (2 * v, k))
        lab = jnp.argmax(r, axis=-1).astype(jnp.int32)      # (B, h, w, 2V)
        lab = jnp.moveaxis(lab, -1, 0)                      # (2V, B, h, w)
        return lab[0::2], lab[1::2]

    def _full_labels(probs):
        refined = par_fn(images_small, probs)
        refined = image_ops.resize_bilinear(refined, (h, w))
        return _per_plane_labels(refined, nclass)

    if class_budget is not None and class_budget < nclass:
        # The reference gathers each image's PRESENT classes before PAR
        # (cam_helper.py:413 ``valid_cams = cams[i, valid_key]``); the batched
        # equivalent compacts the class axis to a fixed ``class_budget``:
        # present classes (bkg first, ascending) fill the slots, absent-class
        # padding channels carry softmax probability 0 and stay 0 through the
        # positive-weight propagation, so the argmax can never select them —
        # labels are EXACTLY the full computation's whenever every image has
        # < class_budget present foreground classes (a lax.cond falls back to
        # the full class axis otherwise).  PAR propagation and the full-res
        # upsample shrink by ~2(1+C)/2K.
        k = class_budget
        present = cls_with_bkg > 0
        count = jnp.sum(present.astype(jnp.int32), axis=-1)
        score = present.astype(jnp.int32) * (2 * nclass) - jnp.arange(nclass)
        _, idx = jax.lax.top_k(score, k)                       # (B, k)

        def _compact_labels(probs):
            # channel selection as a one-hot matmul: a per-pixel dynamic
            # gather on the minor axis compiles to an HBM-bound scatter that
            # cost more than the compaction saved; the (B, K, nclass)
            # selection matrix rides the MXU and fuses with the softmax
            sel = jax.nn.one_hot(idx, nclass, dtype=probs.dtype)  # (B, K, n)
            p = probs.reshape(probs.shape[:3] + (2 * v, nclass))
            compact = jnp.einsum("bhwvc,bkc->bhwvk", p, sel)
            refined = par_fn(
                images_small, compact.reshape(compact.shape[:3] + (2 * v * k,)))
            refined = image_ops.resize_bilinear(refined, (h, w))
            ah, al = _per_plane_labels(refined, k)          # slots, (V, B, h, w)

            def unmap(a):
                # compact slot -> class id WITHOUT a gather (per-pixel
                # table gathers are the slowest op on TPU): k selects
                out = jnp.zeros(a.shape, jnp.int32)
                for j in range(k):
                    out = jnp.where(a == j, idx[None, :, j, None, None], out)
                return out

            return unmap(ah), unmap(al)

        label_h, label_l = jax.lax.cond(
            jnp.all(count <= k), _compact_labels, _full_labels, probs)
    else:
        label_h, label_l = _full_labels(probs)

    if img_box is not None:
        inside = image_ops.box_mask(img_box, h, w)[None]     # over views
        label_h = jnp.where(inside, label_h, ignore_index)
        label_l = jnp.where(inside, label_l, ignore_index)

    label = jnp.where(label_h == 0, ignore_index, label_h)
    label = jnp.where((label_h + label_l) == 0, 0, label)
    return label[0] if squeeze_view else label
