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


def _install_aux_shims() -> None:
    """Shims for utils/train_helper.py's import closure: ``texttable``
    (format_tabs renders the validation table through it — a minimal working
    Texttable) and ``torchvision`` (imported at module level by
    datasets/voc.py:9 and utils/imutils.py:2 but only *used* inside
    functions the validator never calls)."""
    if "texttable" not in sys.modules:
        texttable = types.ModuleType("texttable")

        class Texttable:
            def __init__(self):
                self._rows = []

            def header(self, cols):
                self._rows.append([str(c) for c in cols])

            def add_row(self, cols):
                self._rows.append([
                    c if isinstance(c, str) else f"{float(c):.3f}"
                    for c in cols])

            def draw(self):
                widths = [max(len(r[i]) for r in self._rows)
                          for i in range(len(self._rows[0]))]
                return "\n".join(
                    " | ".join(c.ljust(w) for c, w in zip(r, widths))
                    for r in self._rows)

        texttable.Texttable = Texttable
        sys.modules["texttable"] = texttable

    if "torchvision" not in sys.modules:
        import importlib.machinery

        tv = types.ModuleType("torchvision")
        tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)
        for sub in ("transforms", "datasets", "utils"):
            mod = types.ModuleType(f"torchvision.{sub}")
            mod.__spec__ = importlib.machinery.ModuleSpec(
                f"torchvision.{sub}", None)
            setattr(tv, sub, mod)
            sys.modules[f"torchvision.{sub}"] = mod
        sys.modules["torchvision"] = tv

    # The reference's ``datasets/`` is an implicit namespace package; the
    # HuggingFace ``datasets`` wheel in site-packages would win the import.
    # Register an explicit package object rooted at the reference instead
    # (train_helper.py:15-16 needs datasets.voc / datasets.coco).
    import os
    ref_pkg = sys.modules.get("datasets")
    if ref_pkg is None or not getattr(ref_pkg, "__DUPL_REFERENCE__", False):
        pkg = types.ModuleType("datasets")
        pkg.__path__ = [os.path.join(REFERENCE_ROOT, "datasets")]
        pkg.__DUPL_REFERENCE__ = True
        sys.modules["datasets"] = pkg


def load_train_helper():
    """Import utils/train_helper.py (the in-training validator,
    :90-185) with the aux shims installed."""
    _install_timm_shim()
    _install_aux_shims()
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
    import utils.train_helper as train_helper
    return train_helper


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

    Delegates the layout mapping to the production converter
    (dupl_tpu.models.pretrained.convert_student_state_dict) so the test
    oracle and the shipped .pth bridge are the same code path.

    ``tensors`` overrides the source dict (same keys/shapes as the state
    dict) — used to push per-parameter *gradients* through the same layout
    mapping as the weights.
    """
    from dupl_tpu.models.pretrained import convert_student_state_dict

    state = tensors if tensors is not None else {
        k: _np(v) for k, v in net.state_dict().items()}
    return convert_student_state_dict(state, depth=len(net.encoder.blocks))


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
