"""AOT serving export: package the trained segmentation service as a
self-contained StableHLO artifact.

The reference ships deployment as "clone the repo, install torch, load the
checkpoint" (README + tools/eval_seg_voc.py:172-177).  A TPU-native framework
can do better: ``jax.export`` serializes the *compiled-shape* inference
program — multi-scale + flip forward, branch pick / ensemble, device CRF —
with the weights baked in as constants, so a serving host needs only jax and
the artifact file (no model code, no checkpoint plumbing, no flax).

Cross-platform: exporting for ``platform="tpu"`` works from a CPU-only host —
the Pallas kernels lower to Mosaic IR ahead of time and the dispatch gates
honor :func:`dupl_tpu.utils.platform.force_kernel_platform` — so CI can build
TPU servables.

Artifact format (single file, ``.duplsrv``): an 8-byte magic, a uint64
little-endian JSON length, a UTF-8 JSON metadata blob (input/output contract:
batch size, crop, classes, dataset palette, protocol knobs), then the
``jax.export`` payload.  :func:`load_artifact` returns the deserialized
exported function and the metadata dict; ``engine/serve.py`` builds an HTTP
service on top.
"""

from __future__ import annotations

import dataclasses
import json
import struct
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from dupl_tpu.config import TrainConfig
from dupl_tpu.engine.eval_seg import msc_seg_logits
from dupl_tpu.models.network import DualStudent
from dupl_tpu.ops import crf as crf_ops
from dupl_tpu.ops import image as image_ops
from dupl_tpu.utils.platform import force_kernel_platform

_MAGIC = b"DUPLSRV1"


def make_serving_fn(cfg: TrainConfig, model: DualStudent, *,
                    scales: Sequence[float] = (1.0, 1.5, 1.25),
                    merge: str = "max",
                    branch: "int | str" = "ensemble",
                    crf: bool = True):
    """The deployable inference program: uint8 image batch -> uint8 label map.

    Protocol = the offline eval path (engine/eval_seg.py, fixed-input mode):
    multi-scale + flip seg logits, flip-sum, scale merge, then either one
    student's logits (``branch`` in {1, 2} — the branch the offline eval
    selected for the released weights) or the two-student ensemble mean,
    softmax, device mean-field CRF (fast pivot mode), argmax.  Everything is
    one XLA program; only uint8 crosses the host boundary in both directions.
    """
    if branch not in (1, 2, "ensemble"):
        raise ValueError(f"branch must be 1, 2 or 'ensemble', got {branch!r}")

    def fn(params, images):
        if branch != "ensemble":
            # slice the chosen student OUT of the branch-stacked pytree before
            # the forward: the vmap over branches computes both lanes in one
            # batched op, so XLA's DCE cannot drop the unused student after
            # the fact — slicing here halves the deployed program's FLOPs
            params = jax.tree.map(lambda a: a[branch - 1:branch], params)
        x, image01 = image_ops.prepare_inputs(images)
        seg = msc_seg_logits(
            lambda both: model.apply(params, both).seg,
            x, x.shape[1:3], tuple(scales), merge, batch_dims=2,
        )  # (2 or 1, B, H, W, C)
        pick = jnp.mean(seg, axis=0) if branch == "ensemble" else seg[0]
        if crf:
            probs = jax.nn.softmax(pick, axis=-1)
            pick = crf_ops.crf_from_config(image01, probs, cfg.crf,
                                           fast=True, return_logits=True)
        return jnp.argmax(pick, axis=-1).astype(jnp.uint8)

    return fn


def export_serving(cfg: TrainConfig, model: DualStudent, params, *,
                   batch_size: int = 8,
                   scales: Sequence[float] = (1.0, 1.5, 1.25),
                   merge: str = "max",
                   branch: "int | str" = "ensemble",
                   crf: bool = True,
                   platform: Optional[str] = None,
                   bake_params: bool = True,
                   mesh=None):
    """Trace + lower the serving program for ``platform`` and return
    ``(jax.export.Exported, metadata dict)``.

    ``bake_params=True`` closes over the weights (they become StableHLO
    constants — the artifact is self-contained; ~350 MB for the bf16 ViT-B
    dual student).  ``bake_params=False`` exports a ``(params, images)``
    signature for weight-hot-swap serving; the caller keeps the ``.npz``.

    ``mesh``: a ``jax.sharding.Mesh`` with a ``"data"`` axis exports the
    program batch-sharded over it (images/labels ride ``P("data")``, weights
    replicated) — ONE sealed artifact drives the whole pod slice (e.g. the
    north star's v5e-4: batch 16 -> 4 per chip, XLA inserts no collectives —
    the pipeline is embarrassingly data-parallel).  The artifact records the
    device count; call it under a same-sized mesh."""
    from jax import export as jexport
    from jax.sharding import NamedSharding, PartitionSpec as P

    platform = platform or jax.default_backend()
    crop = cfg.data.crop_size
    fn = make_serving_fn(cfg, model, scales=scales, merge=merge,
                         branch=branch, crf=crf)
    img_spec = jax.ShapeDtypeStruct((batch_size, crop, crop, 3), jnp.uint8)
    jit_kw = {}
    if mesh is not None:
        if batch_size % mesh.shape["data"]:
            raise ValueError(
                f"batch_size {batch_size} must divide over the mesh's "
                f"data axis ({mesh.shape['data']})")
        data = NamedSharding(mesh, P("data"))
        if bake_params:
            jit_kw = dict(in_shardings=data, out_shardings=data)
        else:
            rep = jax.tree.map(lambda _: NamedSharding(mesh, P()), params)
            jit_kw = dict(in_shardings=(rep, data), out_shardings=data)
    with force_kernel_platform(platform):
        if bake_params:
            exp = jexport.export(
                jax.jit(lambda images: fn(params, images), **jit_kw),
                platforms=[platform])(img_spec)
        else:
            p_spec = jax.tree.map(
                lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params)
            exp = jexport.export(jax.jit(fn, **jit_kw),
                                 platforms=[platform])(p_spec, img_spec)
    meta = {
        "format": "duplsrv/1",
        "kind": "segmentation",
        "platforms": list(exp.platforms),
        "batch_size": batch_size,
        "crop_size": crop,
        "num_classes": cfg.num_classes,
        "class_list": list(cfg.class_list),
        "scales": list(scales),
        "merge": merge,
        "branch": branch,
        "crf": crf,
        "bake_params": bake_params,
        "num_devices": 1 if mesh is None else mesh.size,
        "mesh": None if mesh is None else dict(mesh.shape),
        "input": f"uint8[{batch_size},{crop},{crop},3] RGB",
        "output": f"uint8[{batch_size},{crop},{crop}] class ids",
    }
    return exp, meta


def make_pseudo_label_fn(cfg: TrainConfig, trainer=None):
    """The OTHER production program: the pseudo-label factory
    (bench.py's headline pipeline — multi-scale CAM for both students, PAR
    refinement into per-branch pseudo-labels, mean-field CRF over the seg
    posteriors; the work the reference splits between GPU inference and hours
    of host-CPU pydensecrf).

    ``(params, images, cls_label, img_box) -> (refined, crf_labels)``:
    ``refined`` is the per-branch PAR pseudo-label map at the PAR working
    resolution (uint8, ``ignore_index`` marks the reference's ignore band),
    ``crf_labels`` the CRF-refined seg argmax at input resolution (uint8).
    Sealing this lets a labeling fleet mass-produce pseudo ground truth from
    the artifact alone."""
    from dupl_tpu.engine.train import Trainer
    from dupl_tpu.models.network import Student
    from dupl_tpu.ops import cam as cam_ops

    trainer = trainer or Trainer(cfg)
    model = trainer.model

    def fn(params, images, cls_label, img_box):
        x, image01 = image_ops.prepare_inputs(images)

        def one_branch(pb):
            return cam_ops.multi_scale_cam_with_outputs(
                lambda z: model.module.apply(pb, z,
                                             method=Student.forward_with_cams),
                lambda z: model.module.apply(pb, z, method=Student.cam_only),
                x, cfg.cam_scales, with_aux=False,
                merge_size=(x.shape[1] // 2, x.shape[2] // 2),
            )

        cams, _, out = jax.vmap(one_branch)(params)
        refined = trainer._refine(cams, image01, cls_label, img_box,
                                  high_thre=cfg.high_thre)
        seg = image_ops.resize_bilinear(out.seg[0], x.shape[1:3])
        probs = jax.nn.softmax(seg, axis=-1)
        logits = crf_ops.crf_from_config(image01, probs, cfg.crf,
                                         fast=True, return_logits=True)
        return (refined.astype(jnp.uint8),
                jnp.argmax(logits, axis=-1).astype(jnp.uint8))

    return fn


def export_pseudo_labeler(cfg: TrainConfig, params, *,
                          batch_size: int = 16,
                          platform: Optional[str] = None,
                          bake_params: bool = True,
                          mesh=None):
    """Seal the pseudo-label factory (:func:`make_pseudo_label_fn`) the same
    way :func:`export_serving` seals the segmentation service."""
    from jax import export as jexport
    from jax.sharding import NamedSharding, PartitionSpec as P

    platform = platform or jax.default_backend()
    crop = cfg.data.crop_size
    fn = make_pseudo_label_fn(cfg)
    specs = (
        jax.ShapeDtypeStruct((batch_size, crop, crop, 3), jnp.uint8),
        jax.ShapeDtypeStruct((batch_size, cfg.num_classes - 1), jnp.float32),
        jax.ShapeDtypeStruct((batch_size, 4), jnp.int32),
    )
    jit_kw = {}
    if mesh is not None:
        if batch_size % mesh.shape["data"]:
            raise ValueError(
                f"batch_size {batch_size} must divide over the mesh's "
                f"data axis ({mesh.shape['data']})")
        data = NamedSharding(mesh, P("data"))
        # refined carries a leading BRANCH axis of 2; its batch is axis 1
        outs = (NamedSharding(mesh, P(None, "data")), data)
        if bake_params:
            jit_kw = dict(in_shardings=(data,) * 3, out_shardings=outs)
        else:
            rep = jax.tree.map(lambda _: NamedSharding(mesh, P()), params)
            jit_kw = dict(in_shardings=(rep,) + (data,) * 3,
                          out_shardings=outs)
    with force_kernel_platform(platform):
        if bake_params:
            exp = jexport.export(
                jax.jit(lambda im, cl, bx: fn(params, im, cl, bx), **jit_kw),
                platforms=[platform])(*specs)
        else:
            p_spec = jax.tree.map(
                lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params)
            exp = jexport.export(jax.jit(fn, **jit_kw),
                                 platforms=[platform])(p_spec, *specs)
    meta = {
        "format": "duplsrv/1",
        "kind": "pseudo_labeler",
        "platforms": list(exp.platforms),
        "batch_size": batch_size,
        "crop_size": crop,
        "num_classes": cfg.num_classes,
        "cam_scales": list(cfg.cam_scales),
        "ignore_index": cfg.ignore_index,
        "bake_params": bake_params,
        "num_devices": 1 if mesh is None else mesh.size,
        "mesh": None if mesh is None else dict(mesh.shape),
        "input": (f"uint8[{batch_size},{crop},{crop},3] RGB, "
                  f"float32[{batch_size},{cfg.num_classes - 1}] cls one-hot, "
                  f"int32[{batch_size},4] img box"),
        "output": "per-branch PAR pseudo-labels + CRF seg labels (uint8)",
    }
    return exp, meta


def save_artifact(path: str, exported, meta: dict) -> None:
    payload = exported.serialize()
    blob = json.dumps(meta, sort_keys=True).encode("utf-8")
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<Q", len(blob)))
        f.write(blob)
        f.write(payload)


def load_artifact(path: str):
    """-> (jax.export.Exported, metadata dict)."""
    from jax import export as jexport

    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path}: not a DuPL serving artifact "
                             f"(magic {magic!r})")
        (n,) = struct.unpack("<Q", f.read(8))
        meta = json.loads(f.read(n).decode("utf-8"))
        exp = jexport.deserialize(f.read())
    return exp, meta


def export_from_config(cfg: TrainConfig, weights_path: str, out_path: str, *,
                       batch_size: int = 8,
                       scales: Sequence[float] = (1.0, 1.5, 1.25),
                       merge: str = "max",
                       branch: "int | str" = "ensemble",
                       crf: bool = True,
                       platform: Optional[str] = None,
                       bake_params: bool = True) -> dict:
    """One-call path used by tools/export_model.py: weights ``.npz`` in,
    ``.duplsrv`` artifact out.  Returns the metadata dict."""
    from dupl_tpu.engine import checkpoint as ckpt

    model = DualStudent(cfg.model)
    sample = jnp.zeros((1, cfg.data.crop_size, cfg.data.crop_size, 3),
                       jnp.float32)
    template = model.init(jax.random.PRNGKey(0), sample)
    params = ckpt.load_weights(weights_path, template)
    exp, meta = export_serving(cfg, model, params, batch_size=batch_size,
                               scales=scales, merge=merge, branch=branch,
                               crf=crf, platform=platform,
                               bake_params=bake_params)
    save_artifact(out_path, exp, meta)
    return meta
