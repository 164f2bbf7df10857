"""Export a trained checkpoint to a portable single-file params artifact.

The tpu-native analog of the reference's released `.pt` weights
(src/README.md "Pretrained model weights" — one downloadable file that
`compress.py` restores): one compressed `.npz` holding the codec params
(prediction mode — no optimizer or discriminator state) plus the full
config JSON. Every eval CLI (`compress`, `decompress`, `serve`) accepts
the artifact directly via `-ckpt model.npz`.

Use `--f16` to halve the artifact size; restores upcast to float32, so
tables/`.hfc` files regenerated from the restored model are
self-consistent (validate with a re-eval, not against pre-export
artifacts).
"""

import argparse

import numpy as np

from hific_tpu.training import checkpoints
from hific_tpu.utils.logging import setup_logger


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-ckpt", "--checkpoint_dir", required=True,
                   help="Orbax checkpoints directory (config.json + step_N/)")
    p.add_argument("-o", "--output", required=True, help="output .npz path")
    p.add_argument("--f16", action="store_true",
                   help="store floating leaves as float16 (half size; "
                        "restored as float32)")
    p.add_argument("--step", type=int, default=None,
                   help="checkpoint step to export (default: latest)")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    import os

    import jax

    a = parse_args(argv)
    logger = setup_logger(None, name="hific_tpu.export_params")
    config = checkpoints.load_config(a.checkpoint_dir)
    assert config is not None, f"no config.json in {a.checkpoint_dir}"
    if a.step is None:
        path = checkpoints.latest_checkpoint(a.checkpoint_dir)
        assert path is not None, f"no step_N checkpoints in {a.checkpoint_dir}"
    else:
        path = os.path.join(os.path.abspath(a.checkpoint_dir),
                            f"step_{a.step}")
    logger.info("Restoring %s", path)
    params = checkpoints.restore_params(path, config,
                                        jax.random.PRNGKey(a.seed))
    out = checkpoints.export_params_npz(
        a.output, params, config,
        cast_floats=np.float16 if a.f16 else None)
    n_params = sum(int(np.prod(np.shape(l)))
                   for l in jax.tree_util.tree_leaves(params))
    logger.info("Wrote %s (%.1f MB, %.1fM params%s)", out,
                os.path.getsize(out) / 1e6, n_params / 1e6,
                ", f16" if a.f16 else "")
    return out


if __name__ == "__main__":
    main()
