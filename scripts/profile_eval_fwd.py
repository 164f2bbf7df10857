"""Profile the flagship eval forward + pinned codec metric: where do the
milliseconds go, post-d2s?

Round-3 MFU accounting (PERF.md) put the 1 MP eval forward at 43.4 ms
ex-dispatch (22.7% MFU, bandwidth-bound) BEFORE the d2s tail landed
(-23% on the generator alone). This script re-measures the stage split
with the current defaults so the next optimization targets the actual
hot stage, not a stale table:

  1. encoder forward         (pad -> analysis transform)
  2. hyper codec stages      (hyper analysis + synth_stats)
  3. generator forward       (synthesis from quantized latents)
  4. full roundtrip          (the device_envelope program)

Each stage is timed as its own jitted program with a scalar fence
(block_until_ready is unreliable on this transport), K in-jit iterations
where carry dependence is expressible, median over N dispatches with the
~25-30 ms flat dispatch cost reported alongside, not subtracted silently.

Run AFTER any training job has finished — this box's tunnel heartbeat
starves under concurrent load (PERF.md round 3c).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from hific_tpu.config import ModelModes, mse_lpips_config
from hific_tpu.models.hific import HiFiC

H = W = 1024
N_TIMED = 9


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf).reshape(-1)[0])   # scalar fence
    ts = []
    for _ in range(N_TIMED):
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(np.asarray(leaf).reshape(-1)[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    config = mse_lpips_config(dtype="bfloat16")
    model = HiFiC(config)
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "quantize": rng},
                        jnp.zeros((1, 64, 64, 3)), training=True)["params"]
    x = jnp.asarray(np.random.RandomState(0)
                    .rand(1, H, W, 3).astype(np.float32))
    _ = float(x[0, 0, 0, 0])

    # Stage programs -------------------------------------------------- #
    @jax.jit
    def enc(params, x):
        y, _ = model.apply({"params": params}, x, method=HiFiC.encode)
        return y

    y = jax.block_until_ready(enc(params, x))

    @jax.jit
    def roundtrip(params, x, rng):
        inter, _ = model.apply({"params": params}, x, training=False,
                               mode=ModelModes.EVALUATION,
                               rngs={"quantize": rng})
        return inter.reconstruction

    # flat dispatch cost: trivial program, same fencing
    @jax.jit
    def trivial(x):
        return x[0, 0, 0, 0] + 1.0

    t_flat = timed(trivial, x)
    t_enc = timed(enc, params, x)
    t_rt = timed(roundtrip, params, x, jax.random.PRNGKey(1))

    # generator alone on the quantized latents
    yq = jnp.round(y)

    @jax.jit
    def gen(params, yq):
        return model.apply({"params": params}, yq, (H, W),
                           method=HiFiC.generate)

    try:
        t_gen = timed(gen, params, yq)
    except Exception as e:  # method name may differ; report and move on
        print(f"generator-alone stage skipped: {e}", file=sys.stderr)
        t_gen = float("nan")

    print(f"flat dispatch+fence      : {t_flat*1e3:7.1f} ms")
    print(f"encoder fwd (1 MP)       : {t_enc*1e3:7.1f} ms "
          f"({(t_enc-t_flat)*1e3:.1f} ex-flat)")
    print(f"generator fwd (1 MP)     : {t_gen*1e3:7.1f} ms "
          f"({(t_gen-t_flat)*1e3:.1f} ex-flat)")
    print(f"full eval roundtrip      : {t_rt*1e3:7.1f} ms "
          f"({(t_rt-t_flat)*1e3:.1f} ex-flat)")


if __name__ == "__main__":
    main()
