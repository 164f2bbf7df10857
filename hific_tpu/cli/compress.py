"""Compression CLI.

Equivalent of reference compress.py: load a checkpoint in evaluation mode,
build probability tables, compress a directory of images to `.hfc` (and/or
reconstruct), compute PSNR / MS-SSIM (+ LPIPS when weights are provided),
and write a per-image metrics table.

    python -m hific_tpu.cli.compress -ckpt experiments/.../checkpoints \
        -i images/ -o out/ [--save] [--metrics]
"""

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from hific_tpu.codec import Codec
from hific_tpu.training import checkpoints
from hific_tpu.training.data import EvalDataset
from hific_tpu.utils.logging import setup_logger
from hific_tpu.utils.metrics import ms_ssim, psnr


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Compress images with HiFiC (TPU)")
    p.add_argument("-ckpt", "--checkpoint_dir", required=True,
                   help="checkpoint directory (step_N/ + config.json) or a "
                        "portable params .npz (cli.export_params)")
    p.add_argument("-i", "--input", required=True,
                   help="image file or directory")
    p.add_argument("-o", "--output", default="compressed_out")
    p.add_argument("--save", action="store_true",
                   help="also save reconstructions as PNG")
    p.add_argument("--no_metrics", action="store_true")
    p.add_argument("--scalar_rans", action="store_true",
                   help="single-lane rANS (smaller files, slower)")
    p.add_argument("--coder_threads", type=int, default=1,
                   help="lane-shard each rANS payload into this many "
                        "independent streams coded in parallel host threads "
                        "(writes container v2; ~zero size overhead, not "
                        "readable by the reference implementation)")
    p.add_argument("--tile_latents", type=int, default=None,
                   help="decode the generator on latent tiles of this size "
                        "(bounded memory for very large images)")
    p.add_argument("--tile_image", type=int, default=None,
                   help="ENCODE on image tiles of this size (multiple of "
                        "16): bounded memory compression for very large "
                        "images; bit-identical to whole-image encoding")
    p.add_argument("-rc", "--reconstruct", action="store_true",
                   help="reconstruct without entropy coding (no .hfc)")
    p.add_argument("--shape_bucket", type=int, default=None,
                   help="pad inputs to multiples of this size: slightly "
                        "higher bpp, but bounds XLA recompiles on "
                        "mixed-resolution datasets")
    p.add_argument("--spatial", type=int, default=0, metavar="N",
                   help="spatially-partitioned codec: shard each image's "
                        "encoder/generator over the first N devices "
                        "(row bands + halo exchange; bounded per-chip HBM "
                        "for very large images). Mutually exclusive with "
                        "--pipeline/--tile_*")
    p.add_argument("--pipeline", type=int, default=0, metavar="N",
                   help="compress in pipelined groups of N images (device "
                        "compute overlaps host rANS)")
    p.add_argument("--pipeline_chunk", type=int, default=1,
                   help="within a pipelined group, batch this many "
                        "same-shape images into one device program (one "
                        "upload/dispatch/fetch per chunk); 1 disables")
    p.add_argument("--wire_chunk", type=int, default=1,
                   help="batch only the host sync points (stacked buffer/"
                        "index fetches, stacked symbol uploads) of this "
                        "many same-shape images; device programs stay "
                        "per-image. 1 disables")
    p.add_argument("--no_lpips", action="store_true",
                   help="skip the per-image LPIPS column")
    p.add_argument("--lpips_weights", default=None,
                   help="full LPIPS param npz; defaults to lpips.npz next "
                        "to the checkpoint when present (written by the "
                        "convert CLI)")
    p.add_argument("--lpips_backbone_path", default=None,
                   help="torchvision backbone state_dict (.pth)")
    p.add_argument("--seed", type=int, default=42)
    return p.parse_args(argv)


def make_lpips_metric(a, logger):
    """Jitted per-image LPIPS for the metrics table (reference compress.py
    computes it unconditionally per image, compress.py:105,167,188).

    Returns (fn, calibrated) — fn is None when --no_lpips/--no_metrics."""
    if a.no_lpips or a.no_metrics:
        return None, False
    from hific_tpu.models.lpips import build_lpips_fn

    params_npz = a.lpips_weights
    if params_npz is None:
        ckpt_dir = (os.path.dirname(a.checkpoint_dir)
                    if os.path.isfile(a.checkpoint_dir) else a.checkpoint_dir)
        cand = os.path.join(ckpt_dir, "lpips.npz")
        if os.path.isfile(cand):
            params_npz = cand
    fn, calibrated = build_lpips_fn(net="alex",
                                    backbone_path=a.lpips_backbone_path,
                                    params_npz=params_npz)
    if not calibrated:
        logger.warning(
            "LPIPS backbone uncalibrated (seeded random init): 'lpips' "
            "column is architecture-exact but not comparable to published "
            "numbers. Pass --lpips_weights / --lpips_backbone_path.")
    def _metric(x0, x1):
        # Metric integrity: pin the AlexNet/lin convs to HIGHEST precision
        # (TPU's default conv precision is bfloat16 — fine as a training
        # loss in a bf16 model, not for a reported metric; the same class
        # of bug inflated MS-SSIM by +0.13, see utils/metrics.py).
        with jax.default_matmul_precision("highest"):
            return fn(x0.astype(jnp.float32), x1.astype(jnp.float32),
                      normalize=True)

    jfn = jax.jit(_metric)
    return jfn, calibrated


def save_png(path, img):
    """img: (H,W,3) uint8, or float in [0,1] (quantized identically)."""
    from PIL import Image

    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = np.clip(arr * 255.0 + 0.5, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def main(argv=None):
    a = parse_args(argv)
    logger = setup_logger(None, name="hific_tpu.compress")
    os.makedirs(a.output, exist_ok=True)

    logger.info("Restoring %s", a.checkpoint_dir)
    config, params = checkpoints.resolve_eval_checkpoint(
        a.checkpoint_dir, seed=a.seed)

    codec = Codec(config, params, vectorize=not a.scalar_rans,
                  coder_threads=a.coder_threads,
                  pipeline_chunk=a.pipeline_chunk,
                  wire_chunk=a.wire_chunk)
    logger.info("Building prior probability tables...")
    codec.build_tables()

    files = [a.input] if os.path.isfile(a.input) else a.input
    dataset = EvalDataset(files)

    from hific_tpu.entropy.container import load_compressed, save_compressed

    lpips_fn, lpips_calibrated = make_lpips_metric(a, logger)

    def _finish(x, source_bpp, path, recon, t_enc, t_dec, actual_bpp,
                theoretical_bpp, group_avg=False):
        name = os.path.splitext(os.path.basename(path))[0]
        row = _make_row(a, x, source_bpp, path, recon, t_enc, t_dec,
                        actual_bpp, theoretical_bpp,
                        lpips_fn=lpips_fn, lpips_calibrated=lpips_calibrated,
                        group_avg=group_avg)
        if a.save:
            save_png(os.path.join(a.output, name + "_recon.png"), recon[0])
        rows.append(row)
        logger.info("%s: %.4f bpp (ratio %.1f) enc %.2fs dec %.2fs %s",
                    name, row["actual_bpp"], row["compression_ratio"],
                    t_enc, t_dec,
                    f"PSNR {row.get('psnr', float('nan')):.2f}")

    rows = []
    if a.spatial > 1 and not a.reconstruct:
        # Spatially-partitioned codec: ONE image at a time, its transforms
        # row-banded over the mesh (halo exchange keeps streams identical
        # to single-device whenever padding is unchanged; codec.py
        # compress_spatial/decompress_spatial docstrings).
        if a.pipeline > 1 or a.tile_image or a.tile_latents:
            raise SystemExit("--spatial is mutually exclusive with "
                             "--pipeline/--tile_image/--tile_latents")
        from hific_tpu.parallel.mesh import make_mesh

        devices = jax.devices()
        if len(devices) < a.spatial:
            raise SystemExit(f"--spatial {a.spatial} needs {a.spatial} "
                             f"devices; only {len(devices)} visible")
        mesh = make_mesh(devices[: a.spatial])
        logger.info("SP codec over %d devices", a.spatial)
        for x, source_bpp, path in dataset:
            name = os.path.splitext(os.path.basename(path))[0]
            t0 = time.time()
            hfc_path = os.path.join(a.output, name + ".hfc")
            out = codec.compress_spatial(jnp.asarray(x), mesh)
            actual_bpp, theoretical_bpp = save_compressed(out, hfc_path)
            t_enc = time.time() - t0
            t0 = time.time()
            recon = codec.decompress_spatial(load_compressed(hfc_path),
                                             mesh, as_uint8=True)
            t_dec = time.time() - t0
            _finish(x, source_bpp, path, recon, t_enc, t_dec, actual_bpp,
                    theoretical_bpp)
        _write_metrics(a, rows, logger)
        return rows
    if a.pipeline > 1 and not a.reconstruct:
        # Pipelined groups: all device work for the group is enqueued before
        # the host rANS-codes the first image.
        group = []
        items = list(dataset)
        for i in range(0, len(items), a.pipeline):
            group = items[i : i + a.pipeline]
            t0 = time.time()
            outs = codec.compress_many([x for x, _, _ in group],
                                       shape_bucket=a.shape_bucket)
            t_enc = (time.time() - t0) / max(len(group), 1)
            bpps = [save_compressed(
                out, os.path.join(
                    a.output,
                    os.path.splitext(os.path.basename(path))[0] + ".hfc"))
                for (_, _, path), out in zip(group, outs)]
            t0 = time.time()
            recons = codec.decompress_many(outs, as_uint8=True,
                                           tile_latents=a.tile_latents)
            t_dec = (time.time() - t0) / max(len(group), 1)
            for (x, source_bpp, path), (actual_bpp, theoretical_bpp), recon \
                    in zip(group, bpps, recons):
                _finish(x, source_bpp, path, recon, t_enc, t_dec,
                        actual_bpp, theoretical_bpp, group_avg=True)
        _write_metrics(a, rows, logger)
        return rows

    for x, source_bpp, path in dataset:
        name = os.path.splitext(os.path.basename(path))[0]
        if a.reconstruct:  # no entropy coding
            t0 = time.time()
            recon = codec.reconstruct(jnp.asarray(x))
            t_enc, t_dec = 0.0, time.time() - t0
            actual_bpp = theoretical_bpp = float("nan")
        else:
            t0 = time.time()
            hfc_path = os.path.join(a.output, name + ".hfc")
            out = codec.compress(jnp.asarray(x), shape_bucket=a.shape_bucket,
                                 tile_image=a.tile_image)
            actual_bpp, theoretical_bpp = save_compressed(out, hfc_path)
            t_enc = time.time() - t0

            t0 = time.time()
            recon = codec.decompress(load_compressed(hfc_path),
                                     tile_latents=a.tile_latents,
                                     as_uint8=True)
            t_dec = time.time() - t0

        _finish(x, source_bpp, path, recon, t_enc, t_dec, actual_bpp,
                theoretical_bpp)

    _write_metrics(a, rows, logger)
    return rows


def _make_row(a, x, source_bpp, path, recon, t_enc, t_dec, actual_bpp,
              theoretical_bpp, lpips_fn=None, lpips_calibrated=False,
              group_avg=False):
    row = {
        "file": path,
        "source_bpp": round(float(source_bpp), 4),
        "actual_bpp": round(float(actual_bpp), 4),
        "theoretical_bpp": round(float(theoretical_bpp), 4),
        "compression_ratio": round(float(source_bpp / actual_bpp), 2),
    }
    if group_avg:
        # Pipelined groups are timed as a whole (that IS the point of the
        # pipeline); per-image wall times don't exist, so the fields say so.
        row["encode_s_group_avg"] = round(t_enc, 3)
        row["decode_s_group_avg"] = round(t_dec, 3)
    else:
        row["encode_s"] = round(t_enc, 3)
        row["decode_s"] = round(t_dec, 3)
    if not a.no_metrics:
        recon = np.asarray(recon)
        if recon.dtype == np.uint8:  # uint8 wire format (codec.decompress)
            recon = recon.astype(np.float32) / 255.0
        xj, rj = jnp.asarray(x), jnp.asarray(recon)
        row["psnr"] = round(float(psnr(xj, rj)[0]), 3)
        h, w = x.shape[1:3]
        if min(h, w) >= 176:  # MS-SSIM needs 11 * 2^4
            row["ms_ssim"] = round(float(ms_ssim(xj, rj)[0]), 5)
        if lpips_fn is not None:
            row["lpips"] = round(float(lpips_fn(xj, rj).reshape(-1)[0]), 5)
            row["lpips_calibrated"] = bool(lpips_calibrated)
    return row


def _write_metrics(a, rows, logger):
    metrics_path = os.path.join(a.output, "metrics.json")
    with open(metrics_path, "w") as f:
        json.dump(rows, f, indent=2)
    try:  # pandas table like the reference's HDF5 dataframe (compress.py:191-202)
        import pandas as pd

        df = pd.DataFrame(rows)
        df.to_csv(os.path.join(a.output, "metrics.csv"), index=False)
        logger.info("Mean: %.4f bpp | ratio %.1f",
                    df["actual_bpp"].mean(), df["compression_ratio"].mean())
    except ImportError:
        pass
    logger.info("Wrote %s (%d images)", metrics_path, len(rows))


if __name__ == "__main__":
    main()
