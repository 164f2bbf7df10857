"""Round-5: decompose the pipelined device-resident codec pass into its
compress and decompress halves (bench.py times them together). Run from
the live tree or the pre-refactor worktree to attribute the
post-refactor device-metric change to a side.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench
from hific_tpu.codec import Codec
from hific_tpu.config import mse_lpips_config
from hific_tpu.models.hific import HiFiC


def main():
    config = mse_lpips_config(dtype="bfloat16")
    model = HiFiC(config)
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "quantize": rng},
                        jnp.zeros((1, 64, 64, 3)), training=True)["params"]
    codec = Codec(config, params)
    codec.build_tables()
    x = bench._image(bench.H, bench.W)
    alpha, bpp = bench._calibrate(codec, params, x)
    codec.params = bench._scale_latents(params, alpha)
    print(f"operating point: {bpp:.3f} bpp", flush=True)

    imgs_dev = [jnp.asarray(bench._image(bench.H, bench.W, seed=s))
                for s in (1, 2, 3, 4)]
    _ = [int(d[0, 0, 0, 0]) for d in imgs_dev]

    def enc():
        t0 = time.perf_counter()
        outs = codec.compress_many(imgs_dev)
        return time.perf_counter() - t0, outs

    def dec(outs):
        t0 = time.perf_counter()
        recons = codec.decompress_many(outs, as_uint8=True, as_numpy=False)
        _ = [int(r[0, 0, 0, 0]) for r in recons]
        return time.perf_counter() - t0

    _, outs0 = enc()
    dec(outs0)                                      # warmup compiles
    et = float(np.median([enc()[0] for _ in range(7)]))
    dt = float(np.median([dec(outs0) for _ in range(7)]))
    print(f"compress_many x4:   {et*1e3/4:7.1f} ms/img", flush=True)
    print(f"decompress_many x4: {dt*1e3/4:7.1f} ms/img", flush=True)


if __name__ == "__main__":
    main()
