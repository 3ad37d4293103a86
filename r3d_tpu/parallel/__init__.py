from r3d_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    param_shardings,
    shard_batch,
    shard_state,
)
