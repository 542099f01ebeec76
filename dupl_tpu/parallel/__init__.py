from dupl_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, batch_sharding, shard_batch, param_sharding, shard_state,
)
