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

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = DATA_AXIS) -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis_name))


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
