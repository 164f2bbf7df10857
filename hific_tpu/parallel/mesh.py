"""Device-mesh utilities: SPMD data parallelism over ICI.

The reference's `--multigpu` flag is stubbed (train.py:303-308 raises
NotImplementedError); here DP is first-class: a 1-D `data` mesh, batch
sharded over it, parameters replicated. The gradient all-reduce is inserted
by the SPMD partitioner (psum over ICI) — no hand-written collectives needed
for pure DP. Multi-slice scaling would add a second (DCN) mesh axis with the
same sharding rules.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"        # ICI: chips within a slice
REPLICA_AXIS = "replica"  # DCN: across slices / pods


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = DATA_AXIS) -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def infer_n_slices(devices: Sequence) -> int:
    """Number of distinct TPU slices among `devices` (PJRT exposes
    slice_index on multi-slice systems; 1 elsewhere)."""
    idx = {getattr(d, "slice_index", 0) for d in devices}
    return max(len(idx), 1)


def make_mesh_2d(n_slices: Optional[int] = None,
                 devices: Optional[Sequence] = None) -> Mesh:
    """(replica, data) mesh: the outer axis spans slices (DCN), the inner
    axis spans chips within a slice (ICI).

    Devices are ordered so that each mesh ROW is one slice: the per-step
    gradient all-reduce then decomposes into a fast intra-slice ICI
    reduce-scatter/all-gather plus a single small cross-slice (DCN)
    reduction, which XLA inserts automatically from the mesh layout.
    """
    if devices is None:
        devices = jax.devices()
    if n_slices is None:
        n_slices = infer_n_slices(devices)
    assert len(devices) % n_slices == 0, (
        f"{len(devices)} devices not divisible into {n_slices} slices")
    devices = sorted(devices,
                     key=lambda d: (getattr(d, "slice_index", 0), d.id))
    arr = np.asarray(devices).reshape(n_slices, -1)
    return Mesh(arr, (REPLICA_AXIS, DATA_AXIS))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over ALL mesh axes (pure DP on a 1-D
    or 2-D mesh alike: batch split n_slices * per_slice ways)."""
    return NamedSharding(mesh, P(tuple(mesh.axis_names)))


def shard_batch(batch, mesh: Mesh):
    return jax.device_put(batch, batch_sharding(mesh))


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, replicate_sharding(mesh))


def shard_train_step(step_fn, mesh: Mesh, donate_state: bool = True):
    """jit a (state, batch) -> (state, metrics) step for data-parallel
    execution: state replicated, batch sharded on the leading axis.

    XLA turns the loss/grad means over the sharded batch into partial
    reductions + an ICI all-reduce; parameters stay replicated.
    """
    state_sharding = replicate_sharding(mesh)
    data_sharding = batch_sharding(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(state_sharding, data_sharding),
        out_shardings=(state_sharding, state_sharding),
        donate_argnums=(0,) if donate_state else (),
    )
