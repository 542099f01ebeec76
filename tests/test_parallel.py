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


def test_make_mesh_rejects_nondividing_auto_model_axis():
    """Auto-sized data axis must use every device: --model-parallel 3 on 8
    chips would silently idle 2 of them (and in a pod can hang a process)."""
    import pytest

    with pytest.raises(ValueError, match="does not divide"):
        make_mesh(n_model=3)
    # explicit n_data keeps deliberate subsetting available
    assert make_mesh(n_data=2, n_model=3).size == 6


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


def test_fsdp_partition_specs():
    """fsdp=True shards each large-enough leaf over the ``data`` axis on its
    largest free (divisible) dim, composing with TP; tiny leaves (scalars,
    dims not divisible by n_data) stay replicated."""
    mesh = make_mesh(n_data=4, n_model=2)
    model = DualStudent(TINY)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    sh = param_sharding(mesh, params, fsdp=True)

    # every leaf with a dim divisible by 4 beyond the TP axis carries "data"
    leaf, s = _named(params, sh, "attn/qkv/kernel")
    assert "model" in s.spec and "data" in s.spec
    # TP axis untouched (still column-parallel on the last dim)
    assert s.spec[-1] == "model"
    leaf, s = _named(params, sh, "classifier/kernel")
    # heads replicated under TP but still fsdp-sharded over data
    assert "model" not in s.spec and "data" in s.spec
    # the data axis lands on the largest divisible free dim
    data_dim = leaf.shape[list(s.spec).index("data")]
    free = [d for ax, d in zip(s.spec, leaf.shape) if ax is None]
    assert all(data_dim >= d for d in free if d % 4 == 0)

    # biases of size < n_data (or non-divisible) stay replicated
    for (kp, leaf), s in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree.leaves(sh)):
        if leaf.ndim == 0:
            assert all(x is None for x in s.spec)
        for ax, d in zip(s.spec, leaf.shape):
            if ax == "data":
                assert d % 4 == 0


def test_fsdp_checkpoint_roundtrip(tmp_path):
    """An fsdp-sharded TrainState (params + Adam moments distributed over the
    data axis) must save through orbax and restore bit-identically into an
    unsharded template — the exact flow of ``tools/train.py --fsdp --resume``
    (restore happens before shard_state re-places the arrays)."""
    from dupl_tpu.config import voc_config, ParConfig, GmmConfig
    from dupl_tpu.engine.train import Trainer
    from dupl_tpu.engine import checkpoint as ckpt
    from dupl_tpu.parallel import shard_state

    cfg = voc_config(model=TINY, par=ParConfig(num_iter=2),
                     gmm=GmmConfig(min_pixels=10),
                     cam_iters=0, gmm_iters=0, max_iters=10)
    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(3), jnp.zeros((1, 64, 64, 3)))
    host = jax.tree.map(np.asarray, state.params)

    mesh = make_mesh(n_data=8, n_model=1)
    with mesh:
        sharded = shard_state(mesh, state, fsdp=True)
        path = ckpt.save_state(str(tmp_path), sharded)
    assert path.endswith("step_0")

    template = trainer.init_state(jax.random.PRNGKey(7), jnp.zeros((1, 64, 64, 3)))
    restored = ckpt.restore_state(str(tmp_path), template)
    for (kp, a), b in zip(
            jax.tree_util.tree_flatten_with_path(host)[0],
            jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(
            a, np.asarray(b),
            err_msg="/".join(getattr(k, "key", str(k)) for k in kp))


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

    arms = {
        "dp": (8, 1, False),
        "dp_tp": (4, 2, False),
        "fsdp": (8, 1, True),       # ZeRO-style: params+moments over data
        "fsdp_tp": (4, 2, True),    # 2-D: data x model sharded weights
    }
    results = {}
    for name, (n_data, n_model, fsdp) in arms.items():
        trainer = Trainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0), batch["image"][:1])
        mesh = make_mesh(n_data=n_data, n_model=n_model)
        with mesh:
            state = shard_state(mesh, state, fsdp=fsdp)
            dev_batch = shard_batch(mesh, batch)
            state, metrics = trainer.train_step(state, dev_batch)
        results[name] = (
            jax.tree.map(np.asarray, state.params),
            {k: float(v) for k, v in metrics.items()},
        )

    p_dp, m_dp = results["dp"]
    for arm in ("dp_tp", "fsdp", "fsdp_tp"):
        p_arm, m_arm = results[arm]
        for k in m_dp:
            np.testing.assert_allclose(m_dp[k], m_arm[k], rtol=2e-4, atol=1e-5,
                                       err_msg=f"{arm}: metric {k}")
        flat_dp = jax.tree_util.tree_flatten_with_path(p_dp)[0]
        flat_arm = jax.tree.leaves(p_arm)
        for (kp, a), b in zip(flat_dp, flat_arm):
            np.testing.assert_allclose(
                a, b, rtol=5e-4, atol=2e-5,
                err_msg=arm + ": " +
                "/".join(getattr(k, "key", str(k)) for k in kp))
