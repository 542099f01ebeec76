"""PolyWarmupAdamW as an optax transform chain.

Reference semantics (utils/optimizer.py:38-68, utils/train_helper.py:21-53,
model/model_dupl.py:119-154):

* AdamW (betas 0.9/0.999, eps 1e-8, decoupled weight decay 1e-2) where the
  decayed update is scaled by the group LR: ``p -= lr_g * (adam + wd * p)``.
* lr_g = base LR x 1 for the encoder (incl. its norms — the reference builds
  separate backbone/norm groups but configures them identically), x 10 for
  classifier heads and decoder.
* LR schedule: linear warmup from ``lr * 1e-6`` over 1500 steps, then poly
  decay ``(1 - t/T)^0.9``.
* ``pos_embed`` is frozen (vit.py:243) -> multiplier 0 here.

Scaling the *final* AdamW update (adam term + wd term together) by the group
multiplier is exactly torch's per-group LR.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax

from dupl_tpu.config import OptimConfig
from dupl_tpu.ops.schedule import poly_warmup_schedule

HEAD_MODULES = ("classifier", "aux_classifier", "decoder")


def _group_of_path(path) -> str:
    keys = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
    if "pos_embed" in keys:
        return "frozen"
    if any(k in HEAD_MODULES for k in keys):
        return "head"
    return "base"


def group_labels(params) -> Any:
    """Label pytree mapping each param leaf to its LR group."""
    return jax.tree_util.tree_map_with_path(lambda p, _: _group_of_path(p), params)


def scale_by_group(labels, mults) -> optax.GradientTransformation:
    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        updates = jax.tree.map(
            lambda u, lab: u * mults[lab], updates, labels,
        )
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(cfg: OptimConfig, params, max_iters: int) -> optax.GradientTransformation:
    def lr_schedule(step):
        return poly_warmup_schedule(
            step, base_lr=cfg.lr, warmup_iters=cfg.warmup_iters,
            warmup_ratio=cfg.warmup_ratio, max_iters=max_iters, power=cfg.power,
        )

    labels = group_labels(params)
    mults = {
        "base": jnp.float32(1.0),
        "head": jnp.float32(cfg.head_lr_mult),
        "frozen": jnp.float32(0.0),
    }
    return optax.chain(
        optax.adamw(
            learning_rate=lr_schedule,
            b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps,
            weight_decay=cfg.weight_decay,
        ),
        scale_by_group(labels, mults),
    )


def current_lr(cfg: OptimConfig, step, max_iters: int):
    return poly_warmup_schedule(
        step, base_lr=cfg.lr, warmup_iters=cfg.warmup_iters,
        warmup_ratio=cfg.warmup_ratio, max_iters=max_iters, power=cfg.power,
    )
