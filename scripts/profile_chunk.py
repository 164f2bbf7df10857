"""Round-5: does pipeline_chunk pay off now that per-stream caps are
fixed and the split stages batch per chunk? Device-resident 4x1MP pass
(the bench pipelined_device metric) at chunk 1 vs 2 vs 4."""
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

config = mse_lpips_config(dtype="bfloat16")
model = HiFiC(config)
rng = jax.random.PRNGKey(0)
params = model.init({"params": rng, "quantize": rng},
                    jnp.zeros((1, 64, 64, 3)), training=True)["params"]
codec = Codec(config, params)
codec.build_tables()
codec.params = bench._scale_latents(params, 0.04472)  # ~0.42 bpp

imgs_dev = [jnp.asarray(bench._image(bench.H, bench.W, seed=s))
            for s in (1, 2, 3, 4)]
_ = [int(d[0, 0, 0, 0]) for d in imgs_dev]
mp = bench.H * bench.W / 1e6


def device_pass():
    t0 = time.perf_counter()
    outs = codec.compress_many(imgs_dev)
    recons = codec.decompress_many(outs, as_uint8=True, as_numpy=False)
    _ = [int(r[0, 0, 0, 0]) for r in recons]
    return time.perf_counter() - t0


for chunk in (1, 2, 4):
    codec.pipeline_chunk = chunk
    device_pass()                                # warmup compiles
    t = float(np.median([device_pass() for _ in range(7)]))
    print(f"chunk={chunk}: {t*1e3/4:6.1f} ms/img | {4*mp/t:5.2f} MP/s",
          flush=True)
