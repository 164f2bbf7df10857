"""Round-5: wire-chunk A/B at the bench operating point (4 x 1 MP,
~0.42 bpp). Measures each leg and the full round trip for:

  encode: device-coder wire_chunk 1/2/4; host-coder (threads=2) wire 1/4
  decode: device scan (baseline); forced host decode wire 2/4
  round trip: best encode x best decode candidates

Scalar-fenced (block_until_ready lies on this transport — see
.claude/skills/verify). Prints ms/img and MP/s per variant.
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

config = mse_lpips_config(dtype="bfloat16")
model = HiFiC(config)
rng = jax.random.PRNGKey(0)
params = model.init({"params": rng, "quantize": rng},
                    jnp.zeros((1, 64, 64, 3)), training=True)["params"]
params = bench._scale_latents(params, 0.04472)  # ~0.42 bpp

imgs_dev = [jnp.asarray(bench._image(bench.H, bench.W, seed=s))
            for s in (1, 2, 3, 4)]
_ = [int(d[0, 0, 0, 0]) for d in imgs_dev]
mp = bench.H * bench.W / 1e6


def make_codec(**kw):
    c = Codec(config, params, **kw)
    c.build_tables()
    return c


base = make_codec()
OUTS = base.compress_many(imgs_dev)      # fixed payloads for decode A/Bs


def timeit(fn, n=5):
    fn()                                 # warmup compile
    return float(np.median([fn() for _ in range(n)]))


def enc_leg(codec):
    def run():
        t0 = time.perf_counter()
        outs = codec.compress_many(imgs_dev)
        # host-side payloads: building them IS the fence
        _ = sum(len(o.latents_encoded) for o in outs)
        return time.perf_counter() - t0
    return run


def dec_leg(codec, **kw):
    def run():
        t0 = time.perf_counter()
        recons = codec.decompress_many(OUTS, as_uint8=True, as_numpy=False,
                                       **kw)
        _ = [int(r[0, 0, 0, 0]) for r in recons]
        return time.perf_counter() - t0
    return run


def roundtrip(codec, **kw):
    def run():
        t0 = time.perf_counter()
        outs = codec.compress_many(imgs_dev)
        recons = codec.decompress_many(outs, as_uint8=True, as_numpy=False,
                                       **kw)
        _ = [int(r[0, 0, 0, 0]) for r in recons]
        return time.perf_counter() - t0
    return run


def report(label, t):
    print(f"{label:46s}: {t*1e3/4:6.1f} ms/img | {4*mp/t:5.2f} MP/s",
          flush=True)


codecs = {1: base}
for w in (2, 4):
    codecs[w] = make_codec(wire_chunk=w)

print("== encode leg (device coder) ==", flush=True)
for w in (1, 2, 4):
    report(f"device encode, wire={w}", timeit(enc_leg(codecs[w])))

print("== encode leg (host coder, threads=2) ==", flush=True)
host1 = make_codec(coder_threads=2)
host4 = make_codec(coder_threads=2, wire_chunk=4)
report("host encode, wire=1", timeit(enc_leg(host1)))
report("host encode, wire=4", timeit(enc_leg(host4)))

print("== decode leg ==", flush=True)
report("device scan (baseline)", timeit(dec_leg(base)))
for w in (2, 4):
    report(f"host decode, wire={w}",
           timeit(dec_leg(codecs[w], device_decode=False)))

print("== full round trip ==", flush=True)
report("baseline (device enc + device scan)", timeit(roundtrip(base)))
for w in (2, 4):
    report(f"device enc wire={w} + host dec wire={w}",
           timeit(roundtrip(codecs[w], device_decode=False)))
    report(f"device enc wire={w} + device scan",
           timeit(roundtrip(codecs[w])))
print("PROFILE_DONE", flush=True)
