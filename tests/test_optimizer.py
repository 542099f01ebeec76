"""PolyWarmupAdamW parity: group LR multipliers, frozen pos_embed, schedule."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from dupl_tpu.config import ModelConfig, OptimConfig
from dupl_tpu.engine.optimizer import group_labels, make_optimizer
from dupl_tpu.models.network import DualStudent

TINY = ModelConfig(backbone="test_tiny_patch16", compute_dtype="float32")


def _params():
    model = DualStudent(TINY)
    return model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))


def test_group_labels():
    params = _params()
    labels = group_labels(params)
    flat = jax.tree_util.tree_flatten_with_path(labels)[0]
    seen = {}
    for path, lab in flat:
        keys = [getattr(k, "key", str(k)) for k in path]
        seen[tuple(keys)] = lab
    assert any(lab == "frozen" and "pos_embed" in k for k, lab in seen.items())
    assert all(lab == "decoder" for k, lab in seen.items() if "decoder" in k)
    assert all(lab == "head" for k, lab in seen.items() if "classifier" in k)
    assert all(lab == "base" for k, lab in seen.items()
               if "encoder" in k and "pos_embed" not in k)


def test_frozen_and_head_multipliers():
    params = _params()
    # LR = base from step 0; zero decay so kernel updates depend only on LR
    cfg = OptimConfig(warmup_iters=1, warmup_ratio=1.0, weight_decay=0.0)
    opt = make_optimizer(cfg, params, max_iters=1000)
    state = opt.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = opt.update(grads, state, params)

    pos = updates["params"]["encoder"]["pos_embed"]
    assert np.all(np.asarray(pos) == 0.0)  # frozen

    # identical grad=1, no decay: head update = 10x base update
    head_u = np.asarray(updates["params"]["decoder"]["conv8"]["kernel"])
    base_u = np.asarray(updates["params"]["encoder"]["patch_embed"]["bias"])
    ratio = head_u.mean() / base_u.mean()
    assert ratio == pytest.approx(10.0, rel=1e-3)


def test_against_torch_adamw_single_tensor():
    """One tensor, several steps, warmup+poly schedule vs torch AdamW with the
    reference's in-step LR mutation."""
    import torch

    w0 = np.random.RandomState(0).rand(4, 3).astype(np.float32)
    g_seq = [np.random.RandomState(i + 1).rand(4, 3).astype(np.float32) for i in range(6)]

    cfg = OptimConfig(lr=1e-3, warmup_iters=3, warmup_ratio=0.1, power=0.9,
                      weight_decay=0.01)
    params = {"params": {"encoder": {"w": jnp.asarray(w0)}}}
    opt = make_optimizer(cfg, params, max_iters=10)
    state = opt.init(params)
    p = params
    for g in g_seq:
        upd, state = opt.update({"params": {"encoder": {"w": jnp.asarray(g)}}}, state, p)
        p = optax.apply_updates(p, upd)

    wt = torch.tensor(w0, requires_grad=True)
    tor = torch.optim.AdamW([wt], lr=1e-3, betas=(0.9, 0.999), eps=1e-8,
                            weight_decay=0.01)
    for step, g in enumerate(g_seq):
        if step < 3:
            lr = 1e-3 * (1 - (1 - step / 3) * (1 - 0.1))
        else:
            lr = 1e-3 * (1 - step / 10) ** 0.9
        for grp in tor.param_groups:
            grp["lr"] = lr
        wt.grad = torch.tensor(g)
        tor.step()

    np.testing.assert_allclose(
        np.asarray(p["params"]["encoder"]["w"]), wt.detach().numpy(),
        rtol=1e-5, atol=1e-6,
    )
