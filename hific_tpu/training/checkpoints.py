"""Checkpointing with Orbax: self-describing, warmstart-capable.

Semantics from reference src/helpers/utils.py:125-263:
- a checkpoint holds model params, ALL optimizer states, the step counter,
  and the full config (runs are self-describing);
- `warmstart`: initialize a compression_gan model from a rate-distortion
  checkpoint — codec params restored, discriminator (and its optimizer)
  freshly initialized (reference load_model strict=False, train.py:277-283);
- `prediction`: restore params only, skip optimizer state.
"""

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from hific_tpu.config import Config
from hific_tpu.training.train_step import TrainState, create_train_state

CONFIG_FILENAME = "config.json"


def _checkpointer():
    return ocp.StandardCheckpointer()


def save_checkpoint(directory: str, state: TrainState, config: Config,
                    step: Optional[int] = None) -> str:
    """Write `<directory>/step_<N>/` (orbax tree) + config.json."""
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    step = int(state.step) if step is None else int(step)
    path = os.path.join(directory, f"step_{step}")
    ckptr = _checkpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    ckptr.wait_until_finished()
    with open(os.path.join(directory, CONFIG_FILENAME), "w") as f:
        f.write(config.to_json())
    return path


def latest_checkpoint(directory: str) -> Optional[str]:
    # Absolute: Orbax rejects relative checkpoint paths at restore time.
    directory = os.path.abspath(directory)
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if name.startswith("step_") and name[5:].isdigit():
            steps.append(int(name[5:]))
    if not steps:
        return None
    return os.path.join(directory, f"step_{max(steps)}")


def load_config(directory: str) -> Optional[Config]:
    path = os.path.join(directory, CONFIG_FILENAME)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return Config.from_json(f.read())


def restore_train_state(path: str, config: Config, rng,
                        warmstart: bool = False) -> TrainState:
    """Restore a TrainState saved at `path`.

    warmstart=True: `path` may come from a different model_type (e.g. R-D
    only); codec params + their optimizer are restored, everything
    discriminator-shaped keeps its fresh initialization.
    """
    path = os.path.abspath(path)   # Orbax rejects relative paths
    template = create_train_state(config, rng)
    ckptr = _checkpointer()
    if not warmstart:
        return ckptr.restore(path, target=template)

    # Warmstart: restore into a template of the SOURCE config shape, then
    # graft the codec subtrees onto the fresh target state. The source
    # config MUST be present — guessing a template shape would either trip
    # an opaque Orbax structure error or silently restore into a
    # wrong-shaped model.
    src_config_dir = os.path.dirname(os.path.abspath(path))
    src_config = load_config(src_config_dir)
    if src_config is None:
        raise FileNotFoundError(
            f"warmstart source config not found: expected "
            f"{os.path.join(src_config_dir, CONFIG_FILENAME)} next to the "
            f"checkpoint (written by save_checkpoint). Re-save the source "
            f"run's config there, or restore with warmstart=False if the "
            f"model types match.")
    src_template = create_train_state(src_config, rng)
    src_state = ckptr.restore(path, target=src_template)
    return template.replace(
        step=src_state.step,
        params=src_state.params,
        opt_state=src_state.opt_state,
    )


def restore_params(path: str, config: Config, rng):
    """Prediction-mode restore: codec params only."""
    state = restore_train_state(path, config, rng, warmstart=False)
    return state.params
