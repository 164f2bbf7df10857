"""Round-5: decode-leg A/B for the pipelined device metric.

The device pass (bench pipelined_device_mp_s) is device-compute-bound at
~177 ms/img, and its decode leg runs the on-device rANS scan (~60-90 ms
of chip time that the round-3 ablation proved floored). The alternative
host-rANS decode leg moves that work to the host C++ kernel (~6-9 ms/MP)
at the price of wire sync points (idx fetch + symbol upload) that CAN
overlap other images' device compute in a pipelined batch.

Measures, at the bench operating point (~0.42 bpp, 4 x 1 MP):
  1. decompress_many decode leg only: device scan chunk 1/2/4
  2. decompress_many decode leg only: host path (eligibility forced off)
  3. stage micro-costs of the host leg: idx fetch, y host decode,
     y8 upload, packed-generator dispatch+fence
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench
from hific_tpu.codec import Codec, _to_nchw, _to_nhwc_int
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

outs = codec.compress_many(imgs_dev)   # fixed payloads for all variants


def dec_leg():
    t0 = time.perf_counter()
    recons = codec.decompress_many(outs, as_uint8=True, as_numpy=False)
    _ = [int(r[0, 0, 0, 0]) for r in recons]
    return time.perf_counter() - t0


def timeit(fn, n=7):
    """fn returns elapsed seconds."""
    fn()                                     # warmup compile
    return float(np.median([fn() for _ in range(n)]))


def timeit_call(fn, n=7):
    """fn is a plain call; wall-time it."""
    def run():
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0
    return timeit(run, n)


if not os.environ.get("MICRO_ONLY"):
    for chunk in (1, 2, 4):
        codec.pipeline_chunk = chunk
        t = timeit(dec_leg)
        print(f"decode leg, device scan, chunk={chunk}: {t*1e3/4:6.1f} "
              f"ms/img | {4*mp/t:5.2f} MP/s", flush=True)

    # Host-rANS decode leg (stage-1/stage-2 pipeline in decompress_many).
    codec.pipeline_chunk = 1
    orig_elig = codec._device_decode_eligible
    codec._device_decode_eligible = lambda o: False
    t = timeit(dec_leg)
    print(f"decode leg, HOST rANS path          : {t*1e3/4:6.1f} ms/img"
          f" | {4*mp/t:5.2f} MP/s", flush=True)
    codec._device_decode_eligible = orig_elig

# --- stage micro-costs of the host leg (single image) ------------------
out = outs[0]
z_sym_np = codec.factorized.decompress_symbols(
    out.hyperlatents_encoded, out.batch_shape,
    out.hyperlatent_spatial_shape, vectorize=True)
z_sym = jnp.asarray(_to_nhwc_int(z_sym_np), jnp.int16)
mu, sigma, idx = codec._synth_stats_p(codec.params, z_sym,
                                      codec._scale_table_dev)
_ = int(idx[0, 0, 0, 0])

t = timeit_call(lambda: np.asarray(idx))
print(f"  idx fetch (uint8 {idx.nbytes/1e6:.2f} MB)      : {t*1e3:6.1f} ms")

idx_np = _to_nchw(idx).astype(np.int32)
t = timeit_call(lambda: codec.conditional.decompress_symbols(
    out.latents_encoded, idx_np, vectorize=True))
print(f"  y host rANS decode                : {t*1e3:6.1f} ms")

y_sym_np = codec.conditional.decompress_symbols(
    out.latents_encoded, idx_np, vectorize=True)
y8 = np.clip(_to_nhwc_int(y_sym_np), -128, 127).astype(np.int8)


def up():
    a = jnp.asarray(y8)
    a.block_until_ready()


t = timeit_call(up)
print(f"  y8 upload (int8 {y8.nbytes/1e6:.2f} MB)       : {t*1e3:6.1f} ms")

h, w = out.spatial_shape
pos = jnp.full((8,), -1, jnp.int32)
val = jnp.zeros((8,), jnp.int16)
y8_dev = jnp.asarray(y8)


def gen():
    r = codec._gen_packed_u8_p(codec.params, y8_dev, pos, val, mu, (h, w))
    _ = int(r[0, 0, 0, 0])


t = timeit_call(gen)
print(f"  packed gen dispatch+fence         : {t*1e3:6.1f} ms")

# Batched-wire variants (the chunked host-decode leg's building blocks):
# ONE stacked idx fetch and ONE stacked y8 upload for 4 images.
idx4 = jnp.stack([idx, idx, idx, idx])
_ = int(idx4[0, 0, 0, 0, 0])
t = timeit_call(lambda: np.asarray(idx4))
print(f"  idx fetch x4 stacked ({idx4.nbytes/1e6:.2f} MB) : {t*1e3:6.1f} ms"
      f" ({t*1e3/4:.1f} /img)")
y8x4 = np.stack([y8, y8, y8, y8])


def up4():
    a = jnp.asarray(y8x4)
    a.block_until_ready()


t = timeit_call(up4)
print(f"  y8 upload x4 stacked ({y8x4.nbytes/1e6:.2f} MB): {t*1e3:6.1f} ms"
      f" ({t*1e3/4:.1f} /img)")

# Is device_put async on this transport? (PERF.md says asarray syncs.)
host_buf = np.asarray(y8)


def up_async():
    a = jax.device_put(host_buf)
    return a


t0 = time.perf_counter()
aa = up_async()
t_enq = time.perf_counter() - t0
aa.block_until_ready()
t_full = time.perf_counter() - t0
print(f"  device_put enqueue {t_enq*1e3:.1f} ms / ready {t_full*1e3:.1f} ms")
