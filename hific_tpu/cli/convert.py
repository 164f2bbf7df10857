"""Checkpoint conversion CLI: reference PyTorch `.pt` -> hific_tpu Orbax.

    python -m hific_tpu.cli.convert -pt hific_med.pt -o converted_ckpt \
        [--model_type compression_gan] [--regime med]

The output directory is directly usable by the compress CLI
(`-ckpt converted_ckpt`).
"""

import argparse
import os

import jax

from hific_tpu.config import ModelTypes, hific_config, mse_lpips_config
from hific_tpu.training import checkpoints
from hific_tpu.training.train_step import create_train_state
from hific_tpu.utils.convert_torch import load_reference_checkpoint
from hific_tpu.utils.logging import setup_logger


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Convert reference .pt checkpoint")
    p.add_argument("-pt", "--torch_checkpoint", required=True)
    p.add_argument("-o", "--output_dir", required=True)
    p.add_argument("--model_type", default=ModelTypes.COMPRESSION_GAN,
                   choices=[ModelTypes.COMPRESSION, ModelTypes.COMPRESSION_GAN])
    p.add_argument("--regime", default="med", choices=["low", "med", "high"])
    p.add_argument("--latent_channels", type=int, default=220)
    p.add_argument("--n_residual_blocks", type=int, default=9)
    p.add_argument("--hyperlatent_filters", type=int, default=320)
    return p.parse_args(argv)


def main(argv=None):
    a = parse_args(argv)
    logger = setup_logger(None, name="hific_tpu.convert")

    make = (hific_config if a.model_type == ModelTypes.COMPRESSION_GAN
            else mse_lpips_config)
    config = make(regime=a.regime, latent_channels=a.latent_channels,
                  n_residual_blocks=a.n_residual_blocks,
                  hyperlatent_filters=a.hyperlatent_filters)

    logger.info("Converting %s", a.torch_checkpoint)
    params, disc_params, spectral, lpips_params = load_reference_checkpoint(
        a.torch_checkpoint, n_residual_blocks=a.n_residual_blocks)

    logger.info("Building target state (fresh optimizers)...")
    state = create_train_state(config, jax.random.PRNGKey(0))
    state = state.replace(
        params=jax.tree_util.tree_map(jax.numpy.asarray, params))
    if config.use_discriminator and disc_params:
        state = state.replace(
            disc_params=jax.tree_util.tree_map(jax.numpy.asarray, disc_params),
            # spectral state lives under the discriminator's module path
            spectral=jax.tree_util.tree_map(
                jax.numpy.asarray, {"discriminator": spectral}))

    path = checkpoints.save_checkpoint(a.output_dir, state, config, step=0)
    if lpips_params is not None:
        from hific_tpu.models.lpips import save_lpips_npz

        lpips_path = os.path.join(a.output_dir, "lpips.npz")
        save_lpips_npz(lpips_path, lpips_params)
        logger.info("Extracted calibrated LPIPS weights -> %s "
                    "(auto-discovered by the compress CLI)", lpips_path)
    logger.info("Wrote %s — use with: python -m hific_tpu.cli.compress "
                "-ckpt %s ...", path, a.output_dir)
    return path


if __name__ == "__main__":
    main()
