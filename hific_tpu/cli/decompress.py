"""Decode-only CLI: reconstruct images from `.hfc` files, no originals.

The reference has no standalone decoder entry point — its compress.py
(reference compress.py:66-110) always starts from source images and
reconstructs inline, so a user holding only `.hfc` payloads has no CLI.
Serving needs one: the receive side of a compression system sees bytes,
not originals.

    python -m hific_tpu.cli.decompress -ckpt experiments/.../checkpoints \
        -i compressed/ -o recon/ [--pipeline 8] [--tile_latents 64]

Accepts a single `.hfc` file or a directory of them (container v1 and the
lane-sharded v2 both load transparently). Decoding auto-selects the
on-device rANS path where eligible, exactly like `Codec.decompress`.
"""

import argparse
import glob
import os
import time

import jax
import numpy as np

from hific_tpu.codec import Codec
from hific_tpu.entropy.container import load_compressed
from hific_tpu.training import checkpoints
from hific_tpu.utils.logging import setup_logger


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="Reconstruct images from .hfc files (HiFiC TPU)")
    p.add_argument("-ckpt", "--checkpoint_dir", required=True,
                   help="checkpoint directory (step_N/ + config.json) or a "
                        "portable params .npz (cli.export_params)")
    p.add_argument("-i", "--input", required=True,
                   help=".hfc file or directory of .hfc files")
    p.add_argument("-o", "--output", default="decompressed_out")
    p.add_argument("--pipeline", type=int, default=0, metavar="N",
                   help="decode in pipelined groups of N payloads (host "
                        "rANS for payload k+1 overlaps device synthesis "
                        "for payload k)")
    p.add_argument("--tile_latents", type=int, default=None,
                   help="run the generator on latent tiles of this size "
                        "(bounded memory for very large images)")
    p.add_argument("--seed", type=int, default=42)
    return p.parse_args(argv)


def _save_png(path, img):
    from PIL import Image

    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = np.clip(arr * 255.0 + 0.5, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def main(argv=None):
    a = parse_args(argv)
    logger = setup_logger(None, name="hific_tpu.decompress")
    os.makedirs(a.output, exist_ok=True)

    logger.info("Restoring %s", a.checkpoint_dir)
    config, params = checkpoints.resolve_eval_checkpoint(
        a.checkpoint_dir, seed=a.seed)

    codec = Codec(config, params)
    logger.info("Building prior probability tables...")
    codec.build_tables()

    if os.path.isfile(a.input):
        files = [a.input]
    else:
        files = sorted(glob.glob(os.path.join(a.input, "*.hfc")))
    if not files:
        raise SystemExit(f"no .hfc files under {a.input}")

    written = []

    def _emit(path, recon, dt):
        name = os.path.splitext(os.path.basename(path))[0]
        out_png = os.path.join(a.output, name + ".png")
        _save_png(out_png, recon[0])
        h, w = recon.shape[1:3]
        logger.info("%s: %dx%d in %.2fs -> %s", name, w, h, dt, out_png)
        written.append(out_png)

    if a.pipeline > 1 and a.tile_latents is None:
        for i in range(0, len(files), a.pipeline):
            group = files[i : i + a.pipeline]
            t0 = time.time()
            outs = [load_compressed(f) for f in group]
            recons = codec.decompress_many(outs, as_uint8=True)
            dt = (time.time() - t0) / len(group)
            for path, recon in zip(group, recons):
                _emit(path, recon, dt)
    else:
        for path in files:
            t0 = time.time()
            recon = codec.decompress(load_compressed(path),
                                     tile_latents=a.tile_latents,
                                     as_uint8=True)
            _emit(path, recon, time.time() - t0)

    return written


if __name__ == "__main__":
    main()
