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


# ---------------------------------------------------------------------------
# Portable single-file params artifact (.npz)
#
# Orbax checkpoint trees are directories of many files — awkward to ship and
# (on this box) repeatedly lost to environment resets because experiment
# directories are untracked. The .npz artifact is one compressed file holding
# the codec params (prediction-mode: no optimizer/discriminator state) plus
# the full config JSON, so a single committed file is enough to restore a
# servable model. The reference ships exactly this shape of artifact as a
# torch .pt (src/README.md "Pretrained model weights"); this is the
# tpu-native equivalent.
# ---------------------------------------------------------------------------

_NPZ_CONFIG_KEY = "__config_json__"
_NPZ_LEAF_PREFIX = "p:"


def _flatten_params(params):
    flat = {}
    def walk(tree, prefix):
        for k in sorted(tree):
            v = tree[k]
            key = f"{prefix}/{k}" if prefix else str(k)
            if hasattr(v, "items"):
                walk(v, key)
            else:
                flat[key] = v
    walk(params, "")
    return flat


def export_params_npz(out_path: str, params, config: Config,
                      cast_floats=None) -> str:
    """Write codec params + config to one compressed .npz.

    cast_floats: optional numpy dtype (e.g. np.float16) applied to floating
    leaves to halve the artifact size. Restoring upcasts to float32, so the
    restored model is the float32 model whose weights are the rounded
    values — downstream artifacts (tables, .hfc files) regenerated from it
    are self-consistent. Pass None for a bit-exact artifact.
    """
    import numpy as np
    entries = {}
    for key, leaf in _flatten_params(params).items():
        arr = np.asarray(jax.device_get(leaf))
        if cast_floats is not None and np.issubdtype(arr.dtype, np.floating):
            arr = arr.astype(cast_floats)
        entries[_NPZ_LEAF_PREFIX + key] = arr
    entries[_NPZ_CONFIG_KEY] = np.frombuffer(
        config.to_json().encode("utf-8"), dtype=np.uint8)
    out_path = os.path.abspath(out_path)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    import numpy as _np
    _np.savez_compressed(out_path, **entries)
    return out_path


def load_params_npz(path: str):
    """Load a `export_params_npz` artifact -> (config, params).

    Floating leaves are returned as float32 regardless of the stored
    precision (the model computes in f32/bf16; f16 is a storage format).
    """
    import numpy as np
    with np.load(path) as z:
        config = Config.from_json(bytes(z[_NPZ_CONFIG_KEY]).decode("utf-8"))
        params = {}
        for name in z.files:
            if not name.startswith(_NPZ_LEAF_PREFIX):
                continue
            arr = z[name]
            if np.issubdtype(arr.dtype, np.floating) and arr.dtype != np.float32:
                arr = arr.astype(np.float32)
            node = params
            *parents, leaf = name[len(_NPZ_LEAF_PREFIX):].split("/")
            for p in parents:
                node = node.setdefault(p, {})
            node[leaf] = arr
    return config, params


def resolve_eval_checkpoint(checkpoint_arg: str, seed: int = 0):
    """Resolve an eval CLI's `-ckpt` argument -> (config, params).

    Accepts either an Orbax checkpoints DIRECTORY (config.json + step_N/
    trees, the training layout) or a portable params .npz FILE written by
    `export_params_npz` / the export_params CLI.
    """
    if os.path.isfile(checkpoint_arg) and checkpoint_arg.endswith(".npz"):
        return load_params_npz(checkpoint_arg)
    config = load_config(checkpoint_arg)
    if config is None:
        raise FileNotFoundError(
            f"no config.json in {checkpoint_arg} (expected an Orbax "
            f"checkpoints directory or a params .npz file)")
    path = latest_checkpoint(checkpoint_arg)
    if path is None:
        raise FileNotFoundError(f"no step_N checkpoints in {checkpoint_arg}")
    params = restore_params(path, config, jax.random.PRNGKey(seed))
    return config, params
