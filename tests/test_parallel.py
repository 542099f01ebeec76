"""Mesh / tensor-parallel sharding rules on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from dupl_tpu.config import ModelConfig
from dupl_tpu.models.network import DualStudent
from dupl_tpu.parallel import make_mesh, param_sharding, shard_batch

TINY = ModelConfig(backbone="test_tiny_patch16", compute_dtype="float32")


def _named(params, shardings, path_contains):
    flat_p = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_s = jax.tree.leaves(shardings)
    for (kp, leaf), sh in zip(flat_p, flat_s):
        keys = "/".join(getattr(k, "key", str(k)) for k in kp)
        if path_contains in keys:
            return leaf, sh
    raise KeyError(path_contains)


def test_tp_partition_specs():
    mesh = make_mesh(n_data=4, n_model=2)
    model = DualStudent(TINY)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    sh = param_sharding(mesh, params)

    leaf, s = _named(params, sh, "attn/qkv/kernel")
    assert s.spec[-1] == "model" and s.spec[-2] is None  # column parallel
    leaf, s = _named(params, sh, "attn/proj/kernel")
    assert s.spec[-2] == "model"                          # row parallel
    leaf, s = _named(params, sh, "mlp/fc1/kernel")
    assert s.spec[-1] == "model"
    leaf, s = _named(params, sh, "mlp/fc2/kernel")
    assert s.spec[-2] == "model"
    leaf, s = _named(params, sh, "classifier/kernel")
    assert all(x is None for x in s.spec)                 # heads replicated
    leaf, s = _named(params, sh, "pos_embed")
    assert all(x is None for x in s.spec)

    # divisibility: sharded dims divide by the model axis
    leaf, s = _named(params, sh, "attn/qkv/kernel")
    assert leaf.shape[-1] % 2 == 0


def test_dp_only_mesh_replicates():
    mesh = make_mesh(n_data=8, n_model=1)
    model = DualStudent(TINY)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    sh = param_sharding(mesh, params)
    for s in jax.tree.leaves(sh):
        assert all(x is None for x in s.spec)


def test_shard_batch_splits_data_axis():
    mesh = make_mesh(n_data=4, n_model=2)
    batch = {"image": np.zeros((8, 16, 16, 3), np.float32)}
    with mesh:
        dev = shard_batch(mesh, batch)
    shard_shapes = [d.data.shape for d in dev["image"].addressable_shards]
    assert all(s == (2, 16, 16, 3) for s in shard_shapes)


def test_tp_matches_dp_numerically():
    """A dp-only (8x1) mesh and a dp x tp (4x2) mesh must produce the same
    step on the same batch: the Megatron-style param shardings are a layout
    choice, not a math change.  Runs one full (phase-3) train step — CAM, PAR,
    GMM, strong-aug, dual fwd/bwd — and compares loss, every metric, and the
    updated parameters."""
    from dupl_tpu.config import voc_config, ParConfig, GmmConfig
    from dupl_tpu.data.pipeline import synthetic_batch
    from dupl_tpu.engine.train import Trainer
    from dupl_tpu.parallel import shard_state

    cfg = voc_config(
        model=TINY, par=ParConfig(num_iter=2), gmm=GmmConfig(min_pixels=10),
        cam_iters=0, gmm_iters=0, max_iters=10,
    )
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(batch=8, crop=64).items()}

    results = {}
    for name, (n_data, n_model) in {"dp": (8, 1), "dp_tp": (4, 2)}.items():
        trainer = Trainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0), batch["image"][:1])
        mesh = make_mesh(n_data=n_data, n_model=n_model)
        with mesh:
            state = shard_state(mesh, state)
            dev_batch = shard_batch(mesh, batch)
            state, metrics = trainer.train_step(state, dev_batch)
        results[name] = (
            jax.tree.map(np.asarray, state.params),
            {k: float(v) for k, v in metrics.items()},
        )

    p_dp, m_dp = results["dp"]
    p_tp, m_tp = results["dp_tp"]
    for k in m_dp:
        np.testing.assert_allclose(m_dp[k], m_tp[k], rtol=2e-4, atol=1e-5,
                                   err_msg=f"metric {k}")
    flat_dp = jax.tree_util.tree_flatten_with_path(p_dp)[0]
    flat_tp = jax.tree.leaves(p_tp)
    for (kp, a), b in zip(flat_dp, flat_tp):
        np.testing.assert_allclose(
            a, b, rtol=5e-4, atol=2e-5,
            err_msg="/".join(getattr(k, "key", str(k)) for k in kp))
