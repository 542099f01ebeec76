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


def load_deit_checkpoint(path: str, depth: int = 12) -> Dict:
    """Load a DeiT ``.pth`` file (expects the usual ``{"model": state_dict}``
    wrapping) and convert to flax encoder params."""
    import torch  # local import: torch is cpu-only tooling here

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    state = ckpt.get("model", ckpt)
    state = {k: v.numpy() for k, v in state.items() if not k.startswith(("head", "head_dist"))}
    return convert_vit_state_dict(state, depth)


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
