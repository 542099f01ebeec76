"""PolyWarmupAdamW as an optax-compatible transform, torch-faithful.

Reference semantics (utils/optimizer.py:38-68, utils/train_helper.py:21-53,
model/model_dupl.py:119-154):

* AdamW (betas 0.9/0.999, eps 1e-8, decoupled weight decay 1e-2) where the
  decayed update is scaled by the group LR: ``p -= lr_g * (adam + wd * p)``
  (torch's multiplicative ``p *= 1 - lr*wd`` is the same thing — decay is
  linear in ``p``).
* lr_g = base LR x 1 for the encoder (incl. its norms — the reference builds
  separate backbone/norm groups but configures them identically), x 10 for
  classifier heads and decoder.
* LR schedule: linear warmup from ``lr * 1e-6`` over 1500 steps, then poly
  decay ``(1 - t/T)^0.9``; the schedule step (the reference's
  ``global_step``) advances every optimizer step.
* ``pos_embed`` is frozen (vit.py:243) — torch's optimizer never sees it.

Torch-faithful phase gating: during the warm-up phase the reference's
``seg_loss`` is a graphless constant (train_final_voc.py:244,
train_final_coco.py:220), so the decoder parameters get NO gradient and
``AdamW.step`` skips them entirely — no weight decay, no moment updates, and
their per-parameter Adam step count (bias correction) starts at the first
seg-phase step.  To reproduce that exactly, this implementation keeps a
per-leaf step count and accepts an ``inactive`` group set: inactive leaves
pass through untouched (no decay, no moments, no count), while the schedule
step still advances.  The trainer builds one transform per curriculum phase
(warm-up: ``inactive=("decoder",)``); all share one state structure, so the
opt state flows across phase boundaries and checkpoints unchanged.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from dupl_tpu.config import OptimConfig
from dupl_tpu.ops.schedule import poly_warmup_schedule

CLS_HEAD_MODULES = ("classifier", "aux_classifier")


def _group_of_path(path) -> str:
    keys = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
    if "pos_embed" in keys:
        return "frozen"
    if "decoder" in keys:
        return "decoder"
    if any(k in CLS_HEAD_MODULES for k in keys):
        return "head"
    return "base"


def group_labels(params) -> Any:
    """Label pytree mapping each param leaf to its LR group."""
    return jax.tree_util.tree_map_with_path(lambda p, _: _group_of_path(p), params)


class PhasedAdamWState(NamedTuple):
    step: jax.Array  # global schedule step (reference optimizer.global_step)
    count: Any       # per-leaf Adam step counts (torch per-param state "step")
    mu: Any
    nu: Any


def make_optimizer(cfg: OptimConfig, params, max_iters: int,
                   inactive: Tuple[str, ...] = ()) -> optax.GradientTransformation:
    """PolyWarmupAdamW over the labelled groups.  ``inactive`` names groups
    whose parameters receive no gradient this phase (reference: grad=None ->
    ``AdamW.step`` skips them)."""
    labels = group_labels(params)
    mults = {"base": 1.0, "head": cfg.head_lr_mult, "decoder": cfg.head_lr_mult,
             "frozen": 0.0}
    skip = set(inactive) | {"frozen"}
    b1, b2, eps, wd = cfg.betas[0], cfg.betas[1], cfg.eps, cfg.weight_decay

    def lr_schedule(step):
        return poly_warmup_schedule(
            step, base_lr=cfg.lr, warmup_iters=cfg.warmup_iters,
            warmup_ratio=cfg.warmup_ratio, max_iters=max_iters, power=cfg.power,
        )

    def init_fn(params):
        return PhasedAdamWState(
            step=jnp.zeros((), jnp.int32),
            count=jax.tree.map(lambda p: jnp.zeros((), jnp.int32), params),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        assert params is not None, "params required for decoupled weight decay"
        lr = lr_schedule(state.step)

        def leaf(g, p, mu, nu, cnt, lab):
            if lab in skip:
                return jnp.zeros_like(p), mu, nu, cnt
            cnt1 = cnt + 1
            mu1 = b1 * mu + (1 - b1) * g
            nu1 = b2 * nu + (1 - b2) * jnp.square(g)
            t = cnt1.astype(jnp.float32)
            mhat = mu1 / (1 - b1 ** t)
            nhat = nu1 / (1 - b2 ** t)
            upd = -(lr * mults[lab]) * (mhat / (jnp.sqrt(nhat) + eps) + wd * p)
            return upd, mu1, nu1, cnt1

        out = jax.tree.map(leaf, updates, params, state.mu, state.nu,
                           state.count, labels)
        is4 = lambda n: isinstance(n, tuple) and len(n) == 4  # noqa: E731
        pick = lambda i: jax.tree.map(lambda o: o[i], out, is_leaf=is4)  # noqa: E731
        return pick(0), PhasedAdamWState(state.step + 1, pick(3), pick(1), pick(2))

    return optax.GradientTransformation(init_fn, update_fn)


def current_lr(cfg: OptimConfig, step, max_iters: int):
    return poly_warmup_schedule(
        step, base_lr=cfg.lr, warmup_iters=cfg.warmup_iters,
        warmup_ratio=cfg.warmup_ratio, max_iters=max_iters, power=cfg.power,
    )
