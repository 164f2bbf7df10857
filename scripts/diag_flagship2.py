"""Round-5 diagnostic, part 2: diag_flagship.py proved the flagship
step_30000 checkpoint round-trips at 29.95 dB through `compress()` +
`decompress()` (host coder, float wire) — yet the CLI run that produced
demo_out4_flagship/ (compress_many(shape_bucket=512) +
decompress_many(as_uint8=True)) reported 13.3 dB on the same image.

This isolates which leg of the CLI path corrupts, on one image:

  1. host encode -> device decode (uint8)      [decompress as_uint8 auto]
  2. device encode (compress_many, no bucket) -> host decode (float)
  3. compress_many WITH shape_bucket=512 -> host decode (float)
  4. the exact CLI pair: compress_many(bucket) -> decompress_many(u8)

Usage: python scripts/diag_flagship2.py [--ckpt PATH] [--image PATH]
"""
import argparse
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
    args = ap.parse_args()

    cfg = Config.from_json(open(args.config).read())
    img = np.asarray(Image.open(args.image).convert("RGB"), dtype=np.float32) / 255.0
    img = img[None]
    print(f"image {args.image} shape {img.shape} dtype={cfg.dtype}", flush=True)

    params = checkpoints.restore_params(args.ckpt, cfg, jax.random.PRNGKey(0))
    codec = Codec(cfg, params)
    codec.build_tables()

    # 1. host encode -> device decode (uint8 wire)
    out_h = codec.compress(img)
    print(f"host-encode bpp {out_h.total_bpp:.4f}", flush=True)
    r1 = codec.decompress(out_h, as_uint8=True)  # auto device decode
    print(f"1. host enc -> DEVICE decode u8 : PSNR {m(img, r1):.2f}", flush=True)
    r1b = codec.decompress(out_h, as_uint8=True, device_decode=False)
    print(f"1b. host enc -> host decode u8  : PSNR {m(img, r1b):.2f}", flush=True)

    # 2. device encode, no bucket -> host decode float
    out_d = codec.compress_many([img])[0]
    print(f"device-encode bpp {out_d.total_bpp:.4f}", flush=True)
    r2 = codec.decompress(out_d, device_decode=False)
    print(f"2. DEVICE enc -> host decode f32: PSNR {m(img, r2):.2f}", flush=True)

    # 3. device encode WITH shape bucket -> host decode float
    out_b = codec.compress_many([img], shape_bucket=512)[0]
    print(f"bucketed device-encode bpp {out_b.total_bpp:.4f}", flush=True)
    r3 = codec.decompress(out_b, device_decode=False)
    print(f"3. DEVICE enc bucket512 -> host : PSNR {m(img, r3):.2f}", flush=True)

    # 4. the exact CLI pair
    r4 = codec.decompress_many([out_b], as_uint8=True)[0]
    print(f"4. CLI pair (bucket + dev dec)  : PSNR {m(img, r4):.2f}", flush=True)


if __name__ == "__main__":
    main()
