from hific_tpu.parallel.mesh import (
    make_mesh,
    make_mesh_2d,
    infer_n_slices,
    replicate_sharding,
    batch_sharding,
    shard_train_step,
    shard_batch,
)
