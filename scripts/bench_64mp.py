"""64 MP single-chip codec measurement (PERF.md '64 MP single-chip codec').

8192x8192 synthetic image through the flagship model on one chip:
compress with --tile_image (bit-identical to whole-image encoding),
decompress with --tile_latents (bounded HBM). Re-run after decode-path
changes — round 3's uint8 tile wire cut the per-tile download 4x and the
original 112 s decode number predates it (VERDICT r3 next #7).

    python scripts/bench_64mp.py [--side 8192] [--tile_image 2048]
        [--tile_latents 64] [--skip_compress_timing]

Prints a JSON line with compress/decompress seconds and bpp.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--side", type=int, default=8192)
    p.add_argument("--tile_image", type=int, default=2048)
    p.add_argument("--tile_latents", type=int, default=64)
    a = p.parse_args()

    import bench
    from hific_tpu.codec import Codec
    from hific_tpu.config import mse_lpips_config
    from hific_tpu.models.hific import HiFiC

    config = mse_lpips_config(dtype="bfloat16")
    model = HiFiC(config)
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "quantize": rng},
                        jnp.zeros((1, 64, 64, 3)), training=True)["params"]
    codec = Codec(config, params)
    codec.build_tables()

    # Calibrate the operating point on a 1 MP crop (cheap), reuse for 64 MP.
    x_small = bench._image(1024, 1024)
    alpha, bpp_small = bench._calibrate(codec, params, x_small)
    print(f"operating point: alpha={alpha:.5f} ({bpp_small:.3f} bpp @1MP)",
          file=sys.stderr)

    side = a.side
    x = bench._image(side, side, seed=11)
    mp = side * side / 1e6

    t0 = time.time()
    out = codec.compress(x, tile_image=a.tile_image)
    t_enc = time.time() - t0
    bpp = float(out.total_bpp)
    print(f"compress {side}x{side} tile_image={a.tile_image}: "
          f"{t_enc:.1f} s ({bpp:.3f} bpp)", file=sys.stderr)

    t0 = time.time()
    recon = codec.decompress(out, as_uint8=True, tile_latents=a.tile_latents)
    t_dec = time.time() - t0
    assert recon.shape == (1, side, side, 3) and recon.dtype == np.uint8
    print(f"decompress tile_latents={a.tile_latents}: {t_dec:.1f} s",
          file=sys.stderr)

    print(json.dumps({
        "side": side, "mp": mp, "bpp": round(bpp, 4),
        "tile_image": a.tile_image, "tile_latents": a.tile_latents,
        "compress_s": round(t_enc, 1), "decompress_s": round(t_dec, 1),
        "decompress_mp_s": round(mp / t_dec, 3),
    }))


if __name__ == "__main__":
    main()
