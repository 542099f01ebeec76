"""Loader for the reference torch implementation at /root/reference.

The reference depends on ``timm`` (not installed in this container) only for a
handful of helpers (model/backbone/vit.py:30-34); a minimal shim provides
them so the *reference's own code* — not a re-implementation — serves as the
parity oracle for tests/test_reference_parity.py.

Also provides the torch->flax weight bridge for the full ``network`` student
(encoder + LargeFOV decoder + classifiers), so both frameworks can be co-run
on identical weights.
"""

from __future__ import annotations

import sys
import types
from typing import Dict

import numpy as np

REFERENCE_ROOT = "/root/reference"


def _install_timm_shim() -> None:
    if "timm" in sys.modules:
        return
    import torch
    import torch.nn as nn

    timm = types.ModuleType("timm")
    data = types.ModuleType("timm.data")
    data.IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
    data.IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)

    models = types.ModuleType("timm.models")
    helpers = types.ModuleType("timm.models.helpers")
    layers = types.ModuleType("timm.models.layers")
    registry = types.ModuleType("timm.models.registry")

    def load_pretrained(*args, **kwargs):  # never used with pretrained=False
        raise RuntimeError("pretrained checkpoints unavailable in tests")

    helpers.load_pretrained = load_pretrained

    class DropPath(nn.Module):
        """Identity at drop_prob=0 (the reference's default)."""

        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob or 0.0

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            mask = torch.rand(x.shape[0], *([1] * (x.ndim - 1)), device=x.device)
            return x / keep * (mask < keep)

    def to_2tuple(v):
        return v if isinstance(v, tuple) else (v, v)

    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = nn.init.trunc_normal_

    def register_model(fn):
        return fn

    registry.register_model = register_model
    models.helpers = helpers
    models.layers = layers
    models.registry = registry
    models.resnet26d = None  # referenced in imports, never called by DuPL
    models.resnet50d = None

    timm.data = data
    timm.models = models
    for name, mod in {
        "timm": timm, "timm.data": data, "timm.models": models,
        "timm.models.helpers": helpers, "timm.models.layers": layers,
        "timm.models.registry": registry,
    }.items():
        sys.modules[name] = mod


def load_reference():
    """Import the reference packages (model/, utils/, datasets/) and return a
    namespace holding the live modules used by the parity tests."""
    _install_timm_shim()
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)

    import model.model_dupl as model_dupl
    import model.losses as losses
    import model.PAR as PAR
    import utils.cam_helper as cam_helper
    import utils.evaluate as evaluate
    import utils.optimizer as optimizer

    ns = types.SimpleNamespace(
        model_dupl=model_dupl, losses=losses, PAR=PAR,
        cam_helper=cam_helper, evaluate=evaluate, optimizer=optimizer,
    )
    return ns


def make_poly_warmup_adamw(R, net, optim_cfg, max_iters: int):
    """The reference optimizer exactly as the trainer builds it:
    ``PolyWarmupAdamW`` (utils/optimizer.py:38-68) over the 4 param groups of
    ``siamese_network.get_param_groups`` (model/model_dupl.py:119-154) with
    heads/decoder at 10x LR (utils/train_helper.py:21-53)."""
    groups = net.get_param_groups()
    return R.optimizer.PolyWarmupAdamW(
        params=[
            {"params": groups[0], "lr": optim_cfg.lr,
             "weight_decay": optim_cfg.weight_decay},
            {"params": groups[1], "lr": optim_cfg.lr,
             "weight_decay": optim_cfg.weight_decay},
            {"params": groups[2], "lr": optim_cfg.lr * optim_cfg.head_lr_mult,
             "weight_decay": optim_cfg.weight_decay},
            {"params": groups[3], "lr": optim_cfg.lr * optim_cfg.head_lr_mult,
             "weight_decay": optim_cfg.weight_decay},
        ],
        lr=optim_cfg.lr,
        weight_decay=optim_cfg.weight_decay,
        betas=tuple(optim_cfg.betas),
        warmup_iter=optim_cfg.warmup_iters,
        max_iter=max_iters,
        warmup_ratio=optim_cfg.warmup_ratio,
        power=optim_cfg.power,
    )


# ---------------------------------------------------------------------------
# torch network -> flax Student weight bridge
# ---------------------------------------------------------------------------

def _np(t) -> np.ndarray:
    return t.detach().cpu().numpy().astype(np.float32)


def convert_network_state(net, tensors: Dict | None = None) -> Dict:
    """Reference ``network`` (model/model_dupl.py:9) -> flax Student params.

    Reuses dupl_tpu.models.pretrained.convert_vit_state_dict for the encoder
    and maps the heads:
      decoder.conv{6,7}.weight  OIHW -> HWIO
      decoder.conv8.weight      (C,512,1,1) -> (1,1,512,C)
      classifier.weight         (C-1,D,1,1) -> Dense kernel (D,C-1)

    ``tensors`` overrides the source dict (same keys/shapes as the state
    dict) — used to push per-parameter *gradients* through the same layout
    mapping as the weights.
    """
    from dupl_tpu.models.pretrained import convert_vit_state_dict

    state = tensors if tensors is not None else {
        k: _np(v) for k, v in net.state_dict().items()}
    enc = {k[len("encoder."):]: v for k, v in state.items()
           if k.startswith("encoder.")}
    depth = len(net.encoder.blocks)
    params = {"encoder": convert_vit_state_dict(enc, depth=depth)}
    params["decoder"] = {
        "conv6": {"kernel": state["decoder.conv6.weight"].transpose(2, 3, 1, 0)},
        "conv7": {"kernel": state["decoder.conv7.weight"].transpose(2, 3, 1, 0)},
        "conv8": {"kernel": state["decoder.conv8.weight"].transpose(2, 3, 1, 0)},
    }
    params["classifier"] = {
        "kernel": state["classifier.weight"][:, :, 0, 0].T}
    params["aux_classifier"] = {
        "kernel": state["aux_classifier.weight"][:, :, 0, 0].T}
    return params


def _stack_branches(p1: Dict, p2: Dict) -> Dict:
    import jax.numpy as jnp

    def stack(a, b):
        if isinstance(a, dict):
            return {k: stack(a[k], b[k]) for k in a}
        return jnp.stack([jnp.asarray(a), jnp.asarray(b)])

    return {"params": stack(p1, p2)}


def convert_siamese_state(siamese) -> Dict:
    """Reference ``siamese_network`` -> branch-stacked DualStudent params."""
    return _stack_branches(convert_network_state(siamese.branch1),
                           convert_network_state(siamese.branch2))


def convert_siamese_grads(siamese) -> Dict:
    """``p.grad`` of every reference parameter -> the branch-stacked pytree,
    through the same layout mapping as the weights.  Parameters without a
    grad (frozen ``pos_embed``, vit.py:243, or phase-unused heads under
    DDP find_unused_parameters semantics) convert to zeros."""
    import numpy as np

    def grads_of(net):
        out = {}
        for k, p in net.named_parameters():
            g = p.grad
            out[k] = (np.zeros(tuple(p.shape), np.float32) if g is None
                      else _np(g))
        return out

    return _stack_branches(
        convert_network_state(siamese.branch1, grads_of(siamese.branch1)),
        convert_network_state(siamese.branch2, grads_of(siamese.branch2)))


def nchw(x_nhwc: np.ndarray):
    import torch
    return torch.tensor(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))


def nhwc(t) -> np.ndarray:
    return _np(t).transpose(0, 2, 3, 1)
