from hific_tpu.parallel.mesh import (
    make_mesh,
    replicate_sharding,
    batch_sharding,
    shard_train_step,
    shard_batch,
)
