"""Profile the flagship eval forward + pinned codec metric: where do the
milliseconds go, post-d2s?

Round-3 MFU accounting (PERF.md) put the 1 MP eval forward at 43.4 ms
ex-dispatch (22.7% MFU, bandwidth-bound) BEFORE the d2s tail landed
(-23% on the generator alone). This script re-measures the stage split
with the current defaults so the next optimization targets the actual
hot stage, not a stale table:

  1. encoder forward         (pad -> analysis transform)
  2. hyper stages            (hyper analysis + synthesis of mu/sigma)
  3. generator forward       (synthesis from quantized latents)
  4. full roundtrip          (the device_envelope program)

Each timed program returns a SINGLE device-side scalar (``.ravel()[0]``
inside the jit), so only 4 bytes cross the wire per fence — fetching a
whole output leaf would add a size-proportional device-to-host transfer
(~12 MB for the 1 MP reconstruction on this tunneled transport) that
skews the very stage split this script measures. Median over N
dispatches; the ~25-30 ms flat dispatch cost is reported alongside, not
subtracted silently.

Run AFTER any training job has finished — this box's tunnel heartbeat
starves under concurrent load (PERF.md round 3c).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from hific_tpu.config import ModelModes, mse_lpips_config
from hific_tpu.models.hific import HiFiC

H = W = 1024
N_TIMED = 9


def timed(fn, *args):
    """fn must return a scalar (or tuple whose first leaf is a scalar)."""
    out = fn(*args)
    jax.block_until_ready(out)
    float(jax.tree_util.tree_leaves(out)[0])  # 4-byte scalar fence
    ts = []
    for _ in range(N_TIMED):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jax.tree_util.tree_leaves(out)[0])
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

    # Stage programs: each returns one scalar so the fence transfers 4 B. #
    @jax.jit
    def enc(params, x):
        y, _ = model.apply({"params": params}, x, method=HiFiC.encode)
        return y.ravel()[0]

    @jax.jit
    def enc_full(params, x):  # untimed: materialize latents for gen stage
        y, _ = model.apply({"params": params}, x, method=HiFiC.encode)
        return y

    y = jax.block_until_ready(enc_full(params, x))

    @jax.jit
    def hyper(params, y):
        v = {"params": params}
        z = model.apply(v, y, method=HiFiC.hyper_analyze)
        z_q = jnp.floor(z + 0.5)
        mu, sigma = model.apply(v, z_q, method=HiFiC.hyper_synthesize)
        return mu.ravel()[0] + sigma.ravel()[0]

    @jax.jit
    def roundtrip(params, x, rng):
        inter, _ = model.apply({"params": params}, x, training=False,
                               mode=ModelModes.EVALUATION,
                               rngs={"quantize": rng})
        return inter.reconstruction.ravel()[0]

    # flat dispatch cost: trivial program, same fencing
    @jax.jit
    def trivial(x):
        return x[0, 0, 0, 0] + 1.0

    t_flat = timed(trivial, x)
    t_enc = timed(enc, params, x)
    t_hyp = timed(hyper, params, y)
    t_rt = timed(roundtrip, params, x, jax.random.PRNGKey(1))

    # generator alone on the quantized latents
    yq = jnp.round(y)

    @jax.jit
    def gen(params, yq):
        out = model.apply({"params": params}, yq, (H, W),
                          method=HiFiC.generate)
        return out.ravel()[0]

    try:
        t_gen = timed(gen, params, yq)
    except Exception as e:  # method name may differ; report and move on
        print(f"generator-alone stage skipped: {e}", file=sys.stderr)
        t_gen = float("nan")

    print(f"flat dispatch+fence      : {t_flat*1e3:7.1f} ms")
    print(f"encoder fwd (1 MP)       : {t_enc*1e3:7.1f} ms "
          f"({(t_enc-t_flat)*1e3:.1f} ex-flat)")
    print(f"hyper analyze+synth (1MP): {t_hyp*1e3:7.1f} ms "
          f"({(t_hyp-t_flat)*1e3:.1f} ex-flat)")
    print(f"generator fwd (1 MP)     : {t_gen*1e3:7.1f} ms "
          f"({(t_gen-t_flat)*1e3:.1f} ex-flat)")
    print(f"full eval roundtrip      : {t_rt*1e3:7.1f} ms "
          f"({(t_rt-t_flat)*1e3:.1f} ex-flat)")


if __name__ == "__main__":
    main()
