from crnerf_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    data_sharded,
    make_mesh,
    put_global_batch,
    put_replicated,
    replicated,
    shard_train_step,
)
