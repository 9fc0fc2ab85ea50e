from zutis_tpu.parallel.mesh import (  # noqa: F401
    create_mesh,
    param_partition_spec,
    shard_params,
    shard_batch,
    shard_train_state,
)
