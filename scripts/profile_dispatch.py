"""Round-5 transport microbenchmark: what does a CHAINED dispatch cost?

The codec fix split fused programs into 3 chained dispatches (front ->
shared synth_stats -> scan/pack) — correctness-mandated (see
HiFiC.synth_stats). This measures what that costs on the live transport:

  1. K chained trivial dispatches (device-resident intermediates), fetch
     one scalar at the end — per-dispatch enqueue cost.
  2. Same, but interleaved across 4 independent chains (the compress_many
     pipelining pattern) — whether enqueues from different images overlap.
  3. Upload / fetch flat costs at representative sizes for comparison.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


@jax.jit
def step(x):
    return x * 1.000001 + 0.5


def fence(x):
    return float(jnp.ravel(x)[0])


x0 = jnp.asarray(np.random.rand(256, 256).astype(np.float32))
fence(step(x0))  # compile + warm

for k in (1, 2, 4, 8, 16):
    ts = []
    for _ in range(9):
        t0 = time.perf_counter()
        x = x0
        for _ in range(k):
            x = step(x)
        fence(x)
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts)) * 1e3
    print(f"chain k={k:2d}: {med:7.1f} ms total, {med/k:6.1f} ms/dispatch",
          flush=True)

# 4 interleaved chains (enqueue all, then fence all)
for k in (1, 4, 8):
    ts = []
    for _ in range(9):
        t0 = time.perf_counter()
        chains = [x0 for _ in range(4)]
        for _ in range(k):
            chains = [step(c) for c in chains]
        for c in chains:
            fence(c)
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts)) * 1e3
    print(f"4 interleaved chains k={k}: {med:7.1f} ms total, "
          f"{med/(4*k):6.1f} ms/dispatch-equivalent", flush=True)

for mb in (0.06, 0.5, 2.7, 12.0):
    n = int(mb * 1e6 / 4)
    host = np.random.rand(n).astype(np.float32)
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        d = jnp.asarray(host)
        fence(d)
        ts.append(time.perf_counter() - t0)
    up = float(np.median(ts)) * 1e3
    dev = jnp.asarray(host)
    fence(dev)
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        _ = np.asarray(dev)
        ts.append(time.perf_counter() - t0)
    down = float(np.median(ts)) * 1e3
    print(f"{mb:5.2f} MB: upload {up:7.1f} ms | fetch {down:7.1f} ms",
          flush=True)

# Hypotheses for why the codec's 3-dispatch split costs ~27 ms/dispatch
# when a trivial same-fn chain is free: (a) multi-executable chains stall
# the client pipeline; (b) arg marshaling scales with pytree size.
@jax.jit
def step_b(x):
    return x * 0.999999 + 0.25


fence(step_b(x0))
ts = []
for _ in range(9):
    t0 = time.perf_counter()
    x = x0
    for _ in range(4):
        x = step_b(step(x))
    fence(x)
    ts.append(time.perf_counter() - t0)
print(f"alternating 2 fns k=8: {float(np.median(ts))*1e3:7.1f} ms",
      flush=True)

params = {f"layer_{i}": {"w": jnp.zeros((4, 4)), "b": jnp.zeros((4,))}
          for i in range(150)}


@jax.jit
def step_p(p, x):
    return x * 1.000001 + p["layer_0"]["b"][0]


fence(step_p(params, x0))
for k in (1, 4, 8):
    ts = []
    for _ in range(9):
        t0 = time.perf_counter()
        x = x0
        for _ in range(k):
            x = step_p(params, x)
        fence(x)
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts)) * 1e3
    print(f"300-leaf params chain k={k}: {med:7.1f} ms total, "
          f"{med/k:6.1f} ms/dispatch", flush=True)
