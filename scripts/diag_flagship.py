"""Round-5 diagnostic: why does the flagship (C=220, 9-resblock) checkpoint
collapse at full resolution while its training-crop distortion says
~26-28 dB?  (VERDICT r4 item 1.)

Separates three hypotheses with direct A/B measurements on one image
(CLIC2020_5, the worst case at 13.3 dB full-res):

  A. codec-path defect      -> reconstruct() (no rANS) vs decompress() round trip
  B. bf16 eval defect       -> same forward with config dtype float32
  C. crop->full-res gap     -> 320px crops through the same forward

Usage: python scripts/diag_flagship.py [--ckpt PATH] [--image PATH]
"""
import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image

from hific_tpu.codec import Codec
from hific_tpu.config import Config
from hific_tpu.training import checkpoints
from hific_tpu.utils.metrics import psnr

import jax


def m(orig01, recon):
    recon = np.asarray(recon, dtype=np.float32)
    if recon.max() > 1.5:  # uint8 wire
        recon = recon / 255.0
    if recon.ndim == 3:
        recon = recon[None]
    return float(psnr(orig01, np.clip(recon, 0.0, 1.0))[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="experiments/demo4_flagship_compression_low/checkpoints/step_30000")
    ap.add_argument("--config", default="experiments/demo4_flagship_compression_low/checkpoints/config.json")
    ap.add_argument("--image", default="/root/reference/assets/originals/CLIC2020_5.png")
    ap.add_argument("--skip_fp32", action="store_true")
    args = ap.parse_args()

    cfg = Config.from_json(open(args.config).read())
    img = np.asarray(Image.open(args.image).convert("RGB"), dtype=np.float32) / 255.0
    img = img[None]
    print(f"image {args.image} shape {img.shape} ckpt {args.ckpt} dtype={cfg.dtype}")

    crops = {
        "sky_320": img[:, 300:620, 300:620],
        "tex_320": img[:, 1600:1920, 300:620],
    }

    dtypes = ["bfloat16"] if args.skip_fp32 else ["bfloat16", "float32"]
    for dtype in dtypes:
        c = dataclasses.replace(cfg, dtype=dtype)
        params = checkpoints.restore_params(args.ckpt, c, jax.random.PRNGKey(0))
        codec = Codec(c, params)
        for name, crop in crops.items():
            r = codec.reconstruct(crop)
            print(f"[{dtype}] {name} reconstruct: PSNR {m(crop, r):.2f}", flush=True)
        r_full = codec.reconstruct(img)
        print(f"[{dtype}] full-res reconstruct (no rANS): PSNR {m(img, r_full):.2f}", flush=True)
        if dtype == dtypes[0]:
            codec.build_tables()
            out = codec.compress(img)
            rec = codec.decompress(out)
            print(f"[{dtype}] full-res rANS round trip: PSNR {m(img, rec):.2f}  bpp {out.total_bpp:.4f}")
        del codec, params


if __name__ == "__main__":
    main()
