"""DeiT/ViT torch checkpoint -> flax parameter conversion.

The reference loads Facebook DeiT checkpoints through torch.hub
(model/backbone/deit.py:97-109, ``deit_base_patch16_224`` is the default
backbone).  This converter maps a timm/DeiT ``state_dict`` (.pth) onto the
:class:`dupl_tpu.models.vit.ViT` parameter tree.  torch(cpu) is only imported
inside the loader, so the training path has no torch dependency.

Key mapping (timm name -> flax path):
  cls_token                      -> params/encoder/cls_token          (1,1,D)
  pos_embed                      -> params/encoder/pos_embed          (1,N+1,D)
  patch_embed.proj.weight        -> encoder/patch_embed/kernel        OIHW->HWIO
  patch_embed.proj.bias          -> encoder/patch_embed/bias
  blocks.i.norm1.{weight,bias}   -> encoder/blocki/norm1/{scale,bias}
  blocks.i.attn.qkv.{weight,bias}-> encoder/blocki/attn/qkv/{kernel^T,bias}
  blocks.i.attn.proj.*           -> encoder/blocki/attn/proj/*
  blocks.i.mlp.fc{1,2}.*         -> encoder/blocki/mlp/fc{1,2}/*
  norm.{weight,bias}             -> encoder/norm/{scale,bias}
  head.* / head_dist.*           -> dropped (classification head unused)
"""

from __future__ import annotations

from typing import Dict, Mapping

import jax.numpy as jnp
import numpy as np


def _t(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def convert_vit_state_dict(state: Mapping[str, "np.ndarray"], depth: int) -> Dict:
    """timm/DeiT state_dict (name -> array-like) -> flax ViT param dict."""
    p: Dict = {}
    p["cls_token"] = _t(state["cls_token"])
    p["pos_embed"] = _t(state["pos_embed"])
    p["patch_embed"] = {
        "kernel": _t(state["patch_embed.proj.weight"]).transpose(2, 3, 1, 0),
        "bias": _t(state["patch_embed.proj.bias"]),
    }
    for i in range(depth):
        b = f"blocks.{i}."
        p[f"block{i}"] = {
            "norm1": {"scale": _t(state[b + "norm1.weight"]),
                      "bias": _t(state[b + "norm1.bias"])},
            "attn": {
                "qkv": {"kernel": _t(state[b + "attn.qkv.weight"]).T,
                        "bias": _t(state[b + "attn.qkv.bias"])},
                "proj": {"kernel": _t(state[b + "attn.proj.weight"]).T,
                         "bias": _t(state[b + "attn.proj.bias"])},
            },
            "norm2": {"scale": _t(state[b + "norm2.weight"]),
                      "bias": _t(state[b + "norm2.bias"])},
            "mlp": {
                "fc1": {"kernel": _t(state[b + "mlp.fc1.weight"]).T,
                        "bias": _t(state[b + "mlp.fc1.bias"])},
                "fc2": {"kernel": _t(state[b + "mlp.fc2.weight"]).T,
                        "bias": _t(state[b + "mlp.fc2.bias"])},
            },
        }
    p["norm"] = {"scale": _t(state["norm.weight"]), "bias": _t(state["norm.bias"])}
    return p


def normalize_vit_state_dict(
        state: Mapping[str, "np.ndarray"]) -> Dict[str, np.ndarray]:
    """Normalise the torch state-dict layout variants the reference accepts
    into the canonical DeiT naming that :func:`convert_vit_state_dict` maps.

    Handled variants (the reference reaches these through timm's
    ``load_pretrained`` in model/backbone/vit.py:1093-1100 for the
    ImageNet-21k ``vit_base_patch16_224`` path, README.md:142):

    * ``module.`` / ``backbone.`` / ``encoder.`` prefixes stripped;
    * classifier heads dropped (``head.*``, ``head_dist.*``) — 21k heads
      have 21843 rows and are unused;
    * ``pre_logits.*`` dropped (present in in21k checkpoints only;
      timm's plain ViT discards it for feature extraction);
    * 2-D ``patch_embed.proj.weight`` (patchify + linear layout of the
      original jx_/augreg checkpoints) reshaped to conv OIHW, the
      reference's ``_conv_filter`` (model/backbone/vit.py:1058-1065);
    * ``dist_token`` dropped (distilled DeiT variants; the plain backbone
      the trainer uses has none).
    """
    drop = ("head.", "head_dist.", "pre_logits.", "dist_token")
    out: Dict[str, np.ndarray] = {}
    for k, v in state.items():
        for pfx in ("module.", "backbone.", "encoder."):
            if k.startswith(pfx):
                k = k[len(pfx):]
        if k.startswith(drop):
            continue
        v = np.asarray(v)
        if k == "patch_embed.proj.weight" and v.ndim == 2:
            ps = int(round((v.shape[1] // 3) ** 0.5))  # (D, 3*P*P) rows
            v = v.reshape(v.shape[0], 3, ps, ps)
        out[k] = v
    return out


def load_deit_checkpoint(path: str, depth: int = 12) -> Dict:
    """Load a DeiT/ViT ``.pth`` file and convert to flax encoder params.

    Accepts the ``{"model": state_dict}`` wrapping of DeiT releases
    (model/backbone/deit.py:103-108), the ``{"state_dict": ...}`` wrapping
    of timm/mmcls exports, or a bare state dict; layout differences between
    the DeiT-1k and ImageNet-21k checkpoints are normalised by
    :func:`normalize_vit_state_dict`."""
    import torch  # local import: torch is cpu-only tooling here

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    state = ckpt.get("model", ckpt.get("state_dict", ckpt)) if isinstance(ckpt, dict) else ckpt
    state = normalize_vit_state_dict(
        {k: v.numpy() for k, v in state.items()})
    return convert_vit_state_dict(state, depth)


def infer_vit_depth(state: Mapping[str, "np.ndarray"]) -> int:
    """Number of transformer blocks present in a flat torch state dict."""
    idx = [int(k.split(".")[1]) for k in state
           if k.startswith("blocks.") and k.split(".")[1].isdigit()]
    if not idx:
        raise ValueError("no 'blocks.N.*' keys: not a ViT state dict")
    return max(idx) + 1


def convert_student_state_dict(state: Mapping[str, "np.ndarray"],
                               depth: int | None = None) -> Dict:
    """Flat reference ``network`` state dict -> flax Student params.

    The reference student (model/model_dupl.py:9-106) is an encoder plus a
    LargeFOV decoder (bias-free convs, model/decoder/conv_head.py:5-9) and
    two bias-free 1x1-conv classifiers (model/model_dupl.py:26-32).  Layout:

      encoder.*                 -> encoder/* via :func:`convert_vit_state_dict`
      decoder.conv{6,7,8}.weight   OIHW -> HWIO
      classifier.weight         (C-1,D,1,1) -> Dense kernel (D,C-1)
      aux_classifier.weight     likewise

    This is the SAME mapping tests/ref_oracle.py co-runs against the live
    torch module in the parity suite — single-sourced here so the production
    converter and the test oracle cannot drift apart.
    """
    enc = {k[len("encoder."):]: v for k, v in state.items()
           if k.startswith("encoder.")}
    p: Dict = {"encoder": convert_vit_state_dict(
        enc, depth if depth is not None else infer_vit_depth(enc))}
    p["decoder"] = {
        f"conv{i}": {"kernel": _t(state[f"decoder.conv{i}.weight"]
                                  ).transpose(2, 3, 1, 0)}
        for i in (6, 7, 8)}
    p["classifier"] = {"kernel": _t(state["classifier.weight"])[:, :, 0, 0].T}
    p["aux_classifier"] = {
        "kernel": _t(state["aux_classifier.weight"])[:, :, 0, 0].T}
    return p


def convert_siamese_state_dict(state: Mapping[str, "np.ndarray"]) -> Dict:
    """Flat reference ``siamese_network`` state dict (the published trained
    checkpoints, ``torch.save(model.state_dict())`` of the DDP-wrapped model,
    train_final_voc.py:513-519) -> branch-stacked DualStudent variables.

    ``module.`` prefixes are stripped exactly as the reference eval does
    (``k.replace('module.', '')``, tools/eval_seg_voc.py:172-177), then the
    two ``branchN.`` subtrees are converted and stacked on a leading branch
    axis (the repo's DualStudent layout).
    """
    state = {k.replace("module.", ""): v for k, v in state.items()}
    branches = []
    for b in ("branch1", "branch2"):
        sub = {k[len(b) + 1:]: v for k, v in state.items()
               if k.startswith(b + ".")}
        if not sub:
            raise ValueError(
                f"no '{b}.*' keys — not a siamese_network checkpoint "
                f"(got e.g. {sorted(state)[:3]})")
        branches.append(convert_student_state_dict(sub))

    def stack(a, b):
        if isinstance(a, dict):
            return {k: stack(a[k], b[k]) for k in a}
        return np.stack([np.asarray(a), np.asarray(b)])

    return {"params": stack(*branches)}


def load_reference_checkpoint(path: str) -> Dict:
    """Load a reference-trained siamese ``.pth`` (e.g. the published
    ``dupl_voc.pth`` / ``dupl_coco.pth``, README.md:139-144) and convert to
    branch-stacked DualStudent variables."""
    import torch  # local import: torch is cpu-only tooling here

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(ckpt, dict) and not any("." in k for k in ckpt):
        ckpt = ckpt.get("model", ckpt.get("state_dict", ckpt))
    return convert_siamese_state_dict(
        {k: v.numpy() for k, v in ckpt.items()})


def install_pretrained_encoder(params, encoder_params: Dict):
    """Insert converted encoder weights into a (possibly branch-stacked)
    Student param tree.  If leaves carry a leading branch axis of size 2, both
    branches receive the same pretrained weights — matching the reference,
    where both ``network`` branches load the same DeiT checkpoint
    (model_dupl.py:112-117)."""
    import jax

    new = jax.tree.map(lambda x: x, params)  # shallow copy
    target = new["params"]["encoder"]

    def merge(dst, src):
        for k, v in src.items():
            if isinstance(v, dict):
                merge(dst[k], v)
            else:
                cur = dst[k]
                v = jnp.asarray(v, cur.dtype)
                if cur.ndim == v.ndim + 1:  # branch-stacked
                    v = jnp.broadcast_to(v[None], cur.shape)
                dst[k] = v

    merge(target, encoder_params)
    return new
