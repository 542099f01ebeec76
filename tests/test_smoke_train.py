"""End-to-end smoke: a short tiny-model run on a fixed synthetic batch drives
the classification loss down (the reference's quality gate is its committed
log trajectory — SURVEY.md §4; with no real data in CI, memorising one batch
is the equivalent sanity check)."""

import numpy as np
import jax
import jax.numpy as jnp

from dupl_tpu.config import GmmConfig, ModelConfig, OptimConfig, ParConfig, voc_config
from dupl_tpu.data.pipeline import synthetic_batch
from dupl_tpu.engine.train import Trainer


def test_cls_loss_decreases():
    cfg = voc_config(
        model=ModelConfig(backbone="test_tiny_patch16", compute_dtype="float32"),
        optim=OptimConfig(lr=3e-4, warmup_iters=2, warmup_ratio=0.5),
        par=ParConfig(num_iter=1),
        gmm=GmmConfig(min_pixels=10),
        cam_iters=100, gmm_iters=100, max_iters=100,  # stay in phase 1
    )
    trainer = Trainer(cfg)
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(2, crop=64).items()}
    state = trainer.init_state(jax.random.PRNGKey(0), batch["image"][:1])

    losses = []
    for _ in range(12):
        state, metrics = trainer.train_step(state, batch)
        losses.append(float(metrics["cls_loss"]))

    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses
