"""Benchmark: encode+decode throughput of the flagship HiFiC model.

Measures the device compute path of a full compress->reconstruct round trip
(encoder + hyper analysis/synthesis + quantization + generator) on a
1-megapixel image, in megapixels/sec/chip.

Baseline: the reference decodes (sans rANS) a ~megapixel image in ~2-3 s on
GPU (reference src/README.md:87) => ~0.4 MP/s; the north-star target is >5x
that (BASELINE.md). Encode on top of decode makes this conservative.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_MP_PER_S = 0.4  # ~2.5 s / megapixel, decode-only, reference GPU


def main():
    from hific_tpu.config import ModelModes, mse_lpips_config
    from hific_tpu.models.hific import HiFiC

    H = W = 1024  # 1.05 MP per image
    B = 2         # batch amortizes the per-dispatch transport latency
    config = mse_lpips_config(dtype="bfloat16")
    model = HiFiC(config)

    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.RandomState(0).rand(B, H, W, 3), jnp.float32)
    variables = model.init({"params": rng, "quantize": rng},
                           jnp.zeros((1, 64, 64, 3)), training=True)
    params = variables["params"]

    @jax.jit
    def roundtrip(params, x, rng):
        """Evaluation-mode forward: pad -> encode -> hyperprior (hard
        quantization) -> generate -> unpad. The device side of
        compress()+decompress()."""
        intermediates, _ = model.apply(
            {"params": params}, x, training=False,
            mode=ModelModes.EVALUATION, rngs={"quantize": rng})
        return intermediates.reconstruction, intermediates.q_bpp

    # Warmup / compile.
    out = roundtrip(params, x, rng)
    jax.block_until_ready(out)

    # Synchronize via a SCALAR fetch each call: on tunneled PJRT transports
    # block_until_ready() returns before execution completes, so only a
    # device->host read reliably fences the computation. Fetching q_bpp (one
    # f32) forces the whole program without paying the image transfer.
    n_iters = 10
    times = []
    for i in range(n_iters):
        t0 = time.perf_counter()
        out = roundtrip(params, x, jax.random.fold_in(rng, i))
        float(out[1])
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))

    mp = B * H * W / 1e6
    mp_per_s = mp / dt
    print(json.dumps({
        "metric": "encode_decode_throughput_1MP",
        "value": round(mp_per_s, 3),
        "unit": "megapixels/sec/chip",
        "vs_baseline": round(mp_per_s / REFERENCE_MP_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
