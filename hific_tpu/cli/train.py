"""Training CLI.

TPU-native equivalent of reference train.py: config merge, model/optimizer
construction, G/D alternation on distinct batches, periodic eval, LR &
rate-target schedules (inside the jitted step), checkpointing, warmstart.

    python -m hific_tpu.cli.train --model_type compression \
        --dataset_path data/openimages --regime low --steps 1000000

Data parallelism: pass --data_parallel to shard batches over all local
devices (batch_size must divide evenly).
"""

import argparse
import os
import time

import jax
import jax.numpy as jnp

from hific_tpu.config import ModelTypes, hific_config, mse_lpips_config
from hific_tpu.training import checkpoints
from hific_tpu.training.data import TrainDataset, prefetch
from hific_tpu.training.train_step import (
    create_train_state,
    make_eval_step,
    make_train_step_d,
    make_train_step_g,
)
from hific_tpu.utils.logging import (
    MetricWriter,
    save_side_by_side,
    setup_logger,
)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train HiFiC (TPU-native)")
    p.add_argument("-mt", "--model_type", default=ModelTypes.COMPRESSION,
                   choices=[ModelTypes.COMPRESSION, ModelTypes.COMPRESSION_GAN])
    p.add_argument("-regime", "--regime", default="low",
                   choices=["low", "med", "high"])
    p.add_argument("-d", "--dataset_path", default="data/openimages")
    p.add_argument("--eval_dataset_path", default=None,
                   help="held-out crops evaluated every log_interval")
    p.add_argument("-name", "--name", default="hific_tpu_v0.1")
    p.add_argument("-bs", "--batch_size", type=int, default=8)
    p.add_argument("-steps", "--steps", type=int, default=int(1e6))
    p.add_argument("-lr", "--learning_rate", type=float, default=1e-4)
    p.add_argument("-crop", "--crop_size", type=int, default=256)
    p.add_argument("-norm", "--normalize_input_image", action="store_true")
    p.add_argument("--likelihood_type", default="gaussian",
                   choices=["gaussian", "logistic"])
    p.add_argument("--n_residual_blocks", type=int, default=9)
    p.add_argument("--latent_channels", type=int, default=220)
    p.add_argument("--hyperlatent_filters", type=int, default=320)
    p.add_argument("--use_latent_mixture_model", action="store_true")
    p.add_argument("--no_lpips", action="store_true",
                   help="train WITHOUT the perceptual term (k_P * LPIPS). "
                        "By default LPIPS is on, as in the reference "
                        "(model.py:105, k_P=1).")
    p.add_argument("--lpips_weights", default=None,
                   help="full LPIPS param npz (e.g. lpips.npz written by "
                        "the convert CLI from a reference checkpoint)")
    p.add_argument("--lpips_lin_path", default=None,
                   help="torch lin-head weights (alex.pth); defaults to the "
                        "packaged calibrated v0.1 asset")
    p.add_argument("--lpips_backbone_path", default=None,
                   help="torchvision backbone state_dict (.pth); without "
                        "it (or --lpips_weights) the backbone is a seeded "
                        "random init — NOT perceptually calibrated")
    p.add_argument("--uncalibrated_lpips_ok", action="store_true",
                   help="explicitly accept training on random-backbone "
                        "(uncalibrated) LPIPS when no calibrated backbone "
                        "is available; without this flag the CLI refuses "
                        "rather than silently optimizing random features")
    p.add_argument("--log_interval", type=int, default=1000)
    p.add_argument("--save_interval", type=int, default=50000)
    p.add_argument("--warmstart_ckpt", default=None)
    p.add_argument("--resume_ckpt", default=None)
    p.add_argument("--experiments_dir", default="experiments")
    p.add_argument("--data_parallel", action="store_true")
    p.add_argument("--n_slices", type=int, default=None,
                   help="with --data_parallel: lay the mesh out as "
                        "(replica=DCN slices, data=ICI chips) so gradient "
                        "all-reduces ride ICI within slices and only one "
                        "small reduction crosses DCN; default auto-detects "
                        "slice topology")
    p.add_argument("--device_data", action="store_true",
                   help="upload the WHOLE corpus to device memory once and "
                        "draw crops/flips with an on-device jitted sampler "
                        "(zero per-step host uploads; needs uniformly-sized "
                        "images that fit HBM — pre-cropped tiles)")
    p.add_argument("--max_rss_gb", type=float, default=-1.0,
                   help="checkpoint and exit cleanly if host RSS exceeds "
                        "this (default: 90%% of system RAM; 0 disables) — "
                        "turns an OOM SIGKILL into a resumable stop")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--use_remat", action="store_true",
                   help="rematerialize generator resblocks (larger batches)")
    p.add_argument("--use_pallas_norm", action="store_true",
                   help="fused Pallas ChannelNorm kernel (see PERF.md)")
    p.add_argument("--profile_dir", default=None,
                   help="capture a jax.profiler trace of steps 10-15 here")
    p.add_argument("--seed", type=int, default=42)
    return p.parse_args(argv)


def build_config(a):
    kw = dict(
        name=a.name, regime=a.regime, batch_size=a.batch_size,
        n_steps=a.steps, learning_rate=a.learning_rate,
        crop_size=a.crop_size, normalize_input_image=a.normalize_input_image,
        likelihood_type=a.likelihood_type,
        n_residual_blocks=a.n_residual_blocks,
        latent_channels=a.latent_channels,
        hyperlatent_filters=a.hyperlatent_filters,
        use_latent_mixture_model=a.use_latent_mixture_model,
        log_interval=a.log_interval, save_interval=a.save_interval,
        dtype=a.dtype, use_remat=a.use_remat,
        use_pallas_norm=a.use_pallas_norm,
    )
    if a.model_type == ModelTypes.COMPRESSION_GAN:
        return hific_config(**kw)
    return mse_lpips_config(**kw)


def make_lpips_apply(a, logger=None):
    """LPIPS callable for the k_P perceptual term (None iff --no_lpips)."""
    if a.no_lpips:
        return None
    from hific_tpu.models.lpips import build_lpips_fn

    fn, calibrated = build_lpips_fn(net="alex",
                                    lin_path=a.lpips_lin_path,
                                    backbone_path=a.lpips_backbone_path,
                                    params_npz=a.lpips_weights)
    if not calibrated:
        if not getattr(a, "uncalibrated_lpips_ok", False):
            raise SystemExit(
                "LPIPS backbone is a seeded RANDOM init (lin heads "
                "calibrated, backbone not): the perceptual term would "
                "train on random-feature LPIPS. Pass --lpips_backbone_path "
                "/ --lpips_weights for true LPIPS, --no_lpips to drop the "
                "term, or --uncalibrated_lpips_ok to proceed knowingly "
                "(the reference trains with calibrated LPIPS "
                "unconditionally, model.py:105).")
        if logger is not None:
            logger.warning(
                "--uncalibrated_lpips_ok: training on random-backbone "
                "LPIPS (lin heads calibrated, backbone random).")

    def lpips_apply(x_gen, x_real):
        return fn(x_gen, x_real, normalize=True)

    return lpips_apply


def main(argv=None):
    a = parse_args(argv)
    config = build_config(a)

    exp_dir = os.path.join(a.experiments_dir,
                           f"{config.name}_{config.model_type}_{config.regime}")
    ckpt_dir = os.path.join(exp_dir, "checkpoints")
    logger = setup_logger(exp_dir)
    writer = MetricWriter(os.path.join(exp_dir, "tensorboard"))
    logger.info("Config:\n%s", config.to_json())
    logger.info("Devices: %s", jax.devices())

    rng = jax.random.PRNGKey(a.seed)
    if a.resume_ckpt:
        state = checkpoints.restore_train_state(a.resume_ckpt, config, rng)
        logger.info("Resumed from %s at step %d", a.resume_ckpt, int(state.step))
    elif a.warmstart_ckpt:
        state = checkpoints.restore_train_state(a.warmstart_ckpt, config, rng,
                                                warmstart=True)
        logger.info("Warmstarted from %s", a.warmstart_ckpt)
    else:
        state = create_train_state(config, rng)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    logger.info("Codec parameters: %.1fM (%.1f MB fp32)", n_params / 1e6,
                n_params * 4 / 1e6)

    lpips_apply = make_lpips_apply(a, logger)
    if lpips_apply is None:
        logger.warning("--no_lpips: perceptual term disabled; this trains "
                       "MSE+rate only and will NOT reproduce HiFiC "
                       "reconstructions.")

    step_g = make_train_step_g(config, lpips_apply)
    step_d = make_train_step_d(config) if config.use_discriminator else None
    if a.data_parallel:
        from hific_tpu.parallel import (
            infer_n_slices,
            make_mesh,
            make_mesh_2d,
            shard_batch,
            shard_train_step,
        )
        from hific_tpu.parallel.mesh import replicate

        n_slices = a.n_slices or infer_n_slices(jax.devices())
        mesh = make_mesh_2d(n_slices) if n_slices > 1 else make_mesh()
        logger.info("Mesh: %s", mesh)
        state = replicate(state, mesh)
        step_g = shard_train_step(step_g, mesh)
        if step_d is not None:
            step_d = shard_train_step(step_d, mesh)
        put = lambda x: shard_batch(x, mesh)
    else:
        step_g = jax.jit(step_g, donate_argnums=(0,))
        if step_d is not None:
            step_d = jax.jit(step_d, donate_argnums=(0,))
        put = jnp.asarray

    if a.device_data:
        from hific_tpu.training.data import DeviceDataset

        dataset = DeviceDataset(a.dataset_path, crop_size=config.crop_size,
                                batch_size=config.batch_size,
                                normalize=config.normalize_input_image,
                                seed=a.seed,
                                mesh=mesh if a.data_parallel else None)
        logger.info("Device-resident dataset: %s (%.0f MB in HBM)",
                    dataset.data.shape, dataset.data.size / 1e6)
        batches = dataset.batches()  # already on device; no prefetch thread
    else:
        # uint8 batches: 1 B/px over the wire, normalized on device to the
        # same values the float pipeline produced (train_step.ingest_batch)
        dataset = TrainDataset(a.dataset_path, crop_size=config.crop_size,
                               normalize=config.normalize_input_image,
                               seed=a.seed, out_dtype="uint8")
        batches = prefetch(dataset.batches(config.batch_size), size=4)

    eval_batch = None
    eval_fn = None
    recon_dir = None
    if a.eval_dataset_path:
        # ONE fixed held-out batch, evaluated every log interval — eval
        # curves are deterministic and comparable across runs, matching the
        # reference's fixed test batch (train.py:61-79).
        eval_ds = TrainDataset(a.eval_dataset_path,
                               crop_size=config.crop_size,
                               normalize=config.normalize_input_image,
                               seed=a.seed + 1)
        eval_batch = jnp.asarray(next(eval_ds.batches(config.batch_size,
                                                      num_workers=1))[0])
        eval_fn = jax.jit(make_eval_step(config, lpips_apply))
        recon_dir = os.path.join(exp_dir, "reconstructions")
        os.makedirs(recon_dir, exist_ok=True)

    start_step = int(state.step)
    if start_step >= config.n_steps:
        # Steps are ABSOLUTE (schedules — lambda/lr/target-rate — are
        # functions of the global step, and warmstart/resume restore the
        # source counter): a fine-tune must ask for a TOTAL budget larger
        # than the restored step, e.g. warmup 2e5 then GAN with -steps 4e5.
        raise SystemExit(
            f"-steps {config.n_steps} <= restored step {start_step}: "
            f"nothing to train. Steps count from 0 across phases; pass "
            f"the total budget (restored + new steps).")
    def _rss_gb() -> float:
        try:
            with open("/proc/self/status") as f:
                for line in f:
                    if line.startswith("VmRSS"):
                        return int(line.split()[1]) / 1e6
        except OSError:
            pass
        return 0.0

    max_rss_gb = a.max_rss_gb
    if max_rss_gb < 0:  # default: 90% of system RAM
        try:
            with open("/proc/meminfo") as f:
                total_kb = int(f.readline().split()[1])
            max_rss_gb = 0.9 * total_kb / 1e6
        except OSError:
            max_rss_gb = 0.0

    logger.info("Starting training for %d steps", config.n_steps)
    train_generator, d_steps_taken = True, 0
    t0, last_log_step = time.time(), 0
    try:
        for x, source_bpp in batches:
            x = put(x)
            if train_generator:
                state, diag = step_g(state, x)
                step = int(state.step)
                if a.profile_dir and step == 10:
                    jax.profiler.start_trace(a.profile_dir)
                if a.profile_dir and step == 15:
                    jax.tree_util.tree_map(
                        lambda v: v.block_until_ready(), diag)
                    jax.profiler.stop_trace()
                    logger.info("Wrote profiler trace to %s", a.profile_dir)
                if config.use_discriminator:
                    train_generator = False
                if step % config.log_interval == 1:
                    scalars = {k: float(v) for k, v in diag.items()}
                    scalars["images_per_sec"] = (
                        (step - last_log_step) * config.batch_size
                        * (1 + config.discriminator_steps)
                        / max(time.time() - t0, 1e-9))
                    scalars["host_rss_gb"] = _rss_gb()
                    writer.write(step, scalars, prefix="train/")
                    if max_rss_gb and scalars["host_rss_gb"] > max_rss_gb:
                        # checkpoint + clean stop beats the kernel's SIGKILL
                        # (the tunneled transport retains every uploaded
                        # byte — PERF.md round 3b; --device_data avoids it)
                        path = checkpoints.save_checkpoint(
                            ckpt_dir, state, config)
                        raise SystemExit(
                            f"host RSS {scalars['host_rss_gb']:.1f} GB > "
                            f"--max_rss_gb {max_rss_gb:.1f}: checkpointed "
                            f"{path}; resume with --resume_ckpt (or train "
                            f"with --device_data to avoid per-step upload "
                            f"retention)")
                    logger.info(
                        "step %d | loss %.3f | q_bpp %.3f | %.1f img/s",
                        step, scalars["weighted_compression_loss"],
                        scalars["q_rate"], scalars["images_per_sec"])
                    if eval_fn is not None:
                        # Fixed batch + fixed RNG: deterministic eval.
                        ediag, einter = eval_fn(
                            state, eval_batch,
                            jax.random.PRNGKey(a.seed + 2))
                        writer.write(step,
                                     {k: float(v) for k, v in ediag.items()},
                                     prefix="test/")
                        recon = einter.reconstruction
                        x_in = einter.input_image
                        if config.normalize_input_image:
                            recon = (recon + 1.0) / 2.0
                            x_in = (x_in + 1.0) / 2.0
                        writer.write_images(step, {
                            "test/input": x_in,
                            "test/reconstruction": recon,
                        })
                        save_side_by_side(
                            os.path.join(recon_dir, f"step_{step}.png"),
                            x_in, recon)
                    t0, last_log_step = time.time(), step
                if step % config.save_interval == 0:
                    checkpoints.save_checkpoint(ckpt_dir, state, config)
                if step >= config.n_steps:
                    break
            else:
                state, diag_d = step_d(state, x)
                d_steps_taken += 1
                if d_steps_taken >= config.discriminator_steps:
                    d_steps_taken = 0
                    train_generator = True
    except KeyboardInterrupt:
        logger.warning("Interrupted; checkpointing before exit.")

    path = checkpoints.save_checkpoint(ckpt_dir, state, config)
    logger.info("Final checkpoint: %s", path)
    writer.close()
    return path


if __name__ == "__main__":
    main()
