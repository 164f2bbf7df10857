"""Round-5: per-stage timing of the split device-encode path. Enqueue
times tell whether any stage call BLOCKS; the fetch tells where the wall
clock actually goes. 4 device-resident 1 MP images, bench operating
point."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

import bench
from hific_tpu.codec import Codec
from hific_tpu.config import mse_lpips_config
from hific_tpu.models.hific import HiFiC
import jax


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

    codec.compress_many(imgs_dev)  # warmup compiles

    for rep in range(3):
        t0 = time.perf_counter()
        staged = []
        marks = []
        for d in imgs_dev:
            m0 = time.perf_counter()
            buf, z_shape, y_shape = codec._enqueue_device_compress(d)
            m1 = time.perf_counter()
            staged.append((buf, z_shape, y_shape))
            marks.append(m1 - m0)
        tq = time.perf_counter()
        fts, uts = [], []
        outs = []
        for buf, z_shape, y_shape in staged:
            f0 = time.perf_counter()
            row = np.asarray(buf)
            f1 = time.perf_counter()
            out = codec._unpack_device_compress(row, z_shape, y_shape,
                                                (1024, 1024))
            f2 = time.perf_counter()
            outs.append(out)
            fts.append(f1 - f0)
            uts.append(f2 - f1)
        tf = time.perf_counter()
        print(f"rep{rep}: enqueue/img {[round(t*1e3,1) for t in marks]} | "
              f"all-enqueue {1e3*(tq-t0):.1f} ms", flush=True)
        print(f"      fetches {[round(t*1e3,1) for t in fts]} | unpacks "
              f"{[round(t*1e3,1) for t in uts]} | total "
              f"{1e3*(tf-t0):.1f} ms = {1e3*(tf-t0)/4:.1f} ms/img "
              f"(fallback={sum(o is None for o in outs)})", flush=True)


if __name__ == "__main__":
    main()
