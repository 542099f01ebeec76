"""Full-state checkpointing via orbax.

The reference saves only ``model.state_dict()`` to a rolling file with no
resume path — optimizer state, LR step and RNG are lost
(train_final_voc.py:512-519, SURVEY.md §5.4).  Here the full TrainState
(params + opt state + step + rng) round-trips, plus a weights-only export for
eval tools.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from dupl_tpu.engine.train import TrainState


_CKPTR: Optional["ocp.StandardCheckpointer"] = None


def _checkpointer() -> "ocp.StandardCheckpointer":
    # one long-lived checkpointer per process (orbax's documented pattern);
    # constructing one per save leaks its async machinery over long runs
    global _CKPTR
    if _CKPTR is None:
        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def _step_of(entry: str) -> Optional[int]:
    """step_<n> -> n; None for anything else — including orbax's temp dirs
    (``step_500.orbax-checkpoint-tmp-...``) left by an interrupted save,
    which must never crash resume or pruning."""
    if not entry.startswith("step_"):
        return None
    suffix = entry[len("step_"):]
    return int(suffix) if suffix.isdigit() else None


def save_state(ckpt_dir: str, state: TrainState, *, keep: int = 3) -> str:
    """Save the full training state under ``ckpt_dir/step_<n>``; retains the
    ``keep`` (>= 1) most recent steps."""
    if keep < 1:
        raise ValueError(f"keep must be >= 1, got {keep}")
    step = int(state.step)
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    ckptr = _checkpointer()
    ckptr.save(path, dict(params=state.params, opt_state=state.opt_state,
                          step=state.step, rng=state.rng), force=True)
    ckptr.wait_until_finished()
    _prune(ckpt_dir, keep)
    return path


def _prune(ckpt_dir: str, keep: int) -> None:
    entries = sorted(
        (e for e in os.listdir(ckpt_dir) if _step_of(e) is not None),
        key=_step_of,
    )
    for e in entries[:-keep]:
        import shutil
        shutil.rmtree(os.path.join(ckpt_dir, e), ignore_errors=True)


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [s for e in os.listdir(ckpt_dir)
             if (s := _step_of(e)) is not None]
    return max(steps) if steps else None


def restore_state(ckpt_dir: str, template: TrainState,
                  step: Optional[int] = None) -> TrainState:
    """Restore a full TrainState; ``template`` supplies structure/dtypes
    (e.g. a freshly initialised state)."""
    step = step if step is not None else latest_step(ckpt_dir)
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    ckptr = _checkpointer()
    restored = ckptr.restore(path, dict(
        params=template.params, opt_state=template.opt_state,
        step=template.step, rng=template.rng))
    return TrainState(restored["params"], restored["opt_state"],
                      jnp.asarray(restored["step"]), jnp.asarray(restored["rng"]))


def export_weights(path: str, params) -> None:
    """Weights-only export (the artifact the eval tools load), as a flat
    ``.npz`` keyed by param path."""
    flat = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(getattr(k, "key", getattr(k, "name", str(k))) for k in kp)
        flat[key] = np.asarray(leaf)
    np.savez(path, **flat)


def load_weights(path: str, template):
    """Load a weights-only ``.npz`` into the structure of ``template``."""
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    new = []
    for kp, leaf in leaves:
        key = "/".join(getattr(k, "key", getattr(k, "name", str(k))) for k in kp)
        arr = jnp.asarray(data[key], leaf.dtype)
        assert arr.shape == leaf.shape, (key, arr.shape, leaf.shape)
        new.append(arr)
    return jax.tree_util.tree_unflatten(jax.tree_util.tree_structure(template), new)
