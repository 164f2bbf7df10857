"""Piecewise-constant parameter schedules, traceable under jit.

Semantics from reference src/helpers/utils.py:64-72: the base value is
MULTIPLIED by vals[i], where i is the index of the first boundary the step
counter has not yet reached.
"""

import jax.numpy as jnp
import numpy as np

from hific_tpu.config import Schedule


def scheduled_param(base, schedule: Schedule, step, ignore_schedule=False):
    """base * vals[i] with i = #boundaries passed. `step` may be traced."""
    if ignore_schedule or len(schedule.steps) == 0:
        if len(schedule.vals) > 0 and not ignore_schedule:
            return base * schedule.vals[0]
        return base
    boundaries = jnp.asarray(np.array(schedule.steps))
    vals = jnp.asarray(np.array(schedule.vals))
    idx = jnp.sum(step >= boundaries)
    return base * vals[idx]
