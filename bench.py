"""Benchmark: END-TO-END codec throughput of the flagship HiFiC model.

Measures the full `.hfc` pipeline on megapixel images — device transforms
+ rANS entropy coding + container file I/O, both directions:

    compress (uint8 image on host -> upload -> encoder -> hyper codec
              -> rANS -> .hfc on disk)
    decompress (.hfc -> rANS decode ON DEVICE -> synthesis -> generator
                -> uint8 image on host)

Pixels-on-host to pixels-on-host: the image upload and download are both
inside the timed region (on this tunneled transport each costs ~95 ms/MP
— a PCIe-attached host pays ~0.3 ms; see PERF.md).

at a realistic ~0.3 bpp operating point (the HiFiC low-regime rate;
random-init latents are scaled to land there — see _calibrate). This is
the honest number: the entropy coder, the file bytes and the image
download are INCLUDED.

Headline = steady-state throughput over a stream of 4 DISTINCT 1 MP
images via the pipelined batch APIs (compress_many / decompress_many) —
the serving workload, and exactly what the reference CLI does over an
image directory (serially; its coder is its acknowledged bottleneck,
src/README.md:89). Single-image serial latencies are printed to stderr.

Baseline: the reference codes+decodes a ~megapixel image in ~2-3 s on GPU
=> ~0.4 MP/s; the north-star target is >5x that (BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
A stage breakdown goes to stderr.
"""

import json
import os
import sys
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_MP_PER_S = 0.4  # ~2.5 s / megapixel round trip, reference GPU

H = W = 1024   # 1.05 MP
TARGET_BPP = (0.20, 0.45)  # acceptance band around the 0.3 bpp low regime


def _image(h, w, seed=0):
    """Smooth structured test image (natural-image-like spectrum), not white
    noise — symbol statistics drive the rANS cost being measured. Returned
    as HOST uint8 (the codec's ingestion wire): timed compression includes
    the image upload, just as timed decompression includes the uint8 image
    download — pixels-on-host to pixels-on-host, nothing excluded."""
    rng = np.random.RandomState(seed)
    low = rng.rand(h // 32, w // 32, 3).astype(np.float32)
    img = jax.image.resize(jnp.asarray(low), (h, w, 3), "cubic")
    img = img + 0.05 * rng.rand(h, w, 3).astype(np.float32)
    img = (img - img.min()) / (img.max() - img.min())
    return np.asarray(
        np.clip(np.asarray(img) * 255.0 + 0.5, 0, 255)).astype(np.uint8)[None]


def _scale_latents(params, alpha):
    """Scale the encoder's output conv: y -> alpha * y. Controls the coded
    symbol magnitudes, i.e. the operating bpp of the random-init model."""
    conv = dict(params["encoder"]["conv_out"]["Conv_0"])
    conv = {"kernel": conv["kernel"] * alpha, "bias": conv["bias"] * alpha}
    enc = {**dict(params["encoder"]), "conv_out": {"Conv_0": conv}}
    return {**dict(params), "encoder": enc}


def _calibrate(codec, base_params, x):
    """Log-space bisection of the latent scale onto the target bpp band."""
    lo, hi = 1e-3, 2.0
    best = None
    for _ in range(12):
        alpha = float(np.sqrt(lo * hi))
        codec.params = _scale_latents(base_params, alpha)
        # Host coder for the probe: early probes sit far above any sane
        # bpp and would just exercise the device coder's capacity fallback.
        out = codec.compress(x, device_encode=False)
        bpp = out.total_bpp
        best = (alpha, bpp)
        print(f"calibrate: alpha={alpha:.5f} -> {bpp:.3f} bpp",
              file=sys.stderr)
        if TARGET_BPP[0] <= bpp <= TARGET_BPP[1]:
            return alpha, bpp
        if bpp > TARGET_BPP[1]:
            hi = alpha
        else:
            lo = alpha
    return best


def _device_envelope(model, base_params, alpha):
    """r01-comparable device-resident metric: eval-mode forward roundtrip
    (pad -> encode -> hyperprior hard-quantize -> generate -> unpad) on a
    device-resident 1 MP image, scalar-fenced (on this tunneled transport
    block_until_ready returns early; a scalar fetch fences reliably).
    Excludes rANS and the wire by construction — NOT comparable with the
    e2e headline."""
    from hific_tpu.config import ModelModes

    params = _scale_latents(base_params, alpha)
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(_image(H, W, seed=7)[0][None], jnp.float32) / 255.0

    @jax.jit
    def roundtrip(params, x, rng):
        intermediates, _ = model.apply(
            {"params": params}, x, training=False,
            mode=ModelModes.EVALUATION, rngs={"quantize": rng})
        return intermediates.reconstruction, intermediates.q_bpp

    rng0 = jax.random.PRNGKey(1)
    jax.block_until_ready(roundtrip(params, x, rng0))
    times = []
    for i in range(10):
        t0 = time.perf_counter()
        out = roundtrip(params, x, jax.random.fold_in(rng0, i))
        float(out[1])
        times.append(time.perf_counter() - t0)
    return (H * W / 1e6) / float(np.median(times))


def main():
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
    x = _image(H, W)

    alpha, bpp = _calibrate(codec, params, x)
    print(f"operating point: alpha={alpha:.5f}, {bpp:.3f} bpp",
          file=sys.stderr)

    tmpdir = tempfile.mkdtemp(prefix="hific_bench_")
    path = os.path.join(tmpdir, "bench.hfc")

    # Warmup both directions (compiles cached from calibration for compress).
    codec.compress_file(x, path)
    recon = codec.decompress_file(path, as_uint8=True)
    assert recon.dtype == np.uint8 and recon.shape == (1, H, W, 3)

    n_iters = 5
    t_enc, t_dec = [], []
    for _ in range(n_iters):
        t0 = time.perf_counter()
        actual_bpp, _ = codec.compress_file(x, path)
        t1 = time.perf_counter()       # file on disk == fully synced
        recon = codec.decompress_file(path, as_uint8=True)
        _ = int(recon[0, 0, 0, 0])     # host array; scalar touch for symmetry
        t2 = time.perf_counter()
        t_enc.append(t1 - t0)
        t_dec.append(t2 - t1)
    enc = float(np.median(t_enc))
    dec = float(np.median(t_dec))
    size = os.path.getsize(path)

    mp = H * W / 1e6
    serial = mp / (enc + dec)
    print(f"serial: compress_file {enc*1e3:.0f} ms | decompress_file "
          f"{dec*1e3:.0f} ms | {actual_bpp:.3f} bpp | {size} B | {mp:.2f} MP"
          f" | {serial:.2f} MP/s", file=sys.stderr)

    # Steady-state pipelined throughput over 4 distinct images (device
    # compute overlaps host rANS and the wire; files still written/read).
    from hific_tpu.entropy.container import load_compressed, save_compressed

    imgs = [_image(H, W, seed=s) for s in (1, 2, 3, 4)]
    paths = [os.path.join(tmpdir, f"bench_{i}.hfc") for i in range(4)]

    def one_pass():
        t0 = time.perf_counter()
        outs = codec.compress_many(imgs)
        for o, p in zip(outs, paths):
            save_compressed(o, p)
        loaded = [load_compressed(p) for p in paths]
        recons = codec.decompress_many(loaded, as_uint8=True)
        _ = [int(r[0, 0, 0, 0]) for r in recons]
        return time.perf_counter() - t0, [float(o.total_bpp) for o in outs]

    one_pass()                                   # warmup compiles
    times, bpps = zip(*[one_pass() for _ in range(7)])
    total = float(np.median(times))
    mp_per_s = 4 * mp / total
    print(f"pipelined x4: {total*1e3/4:.0f} ms/img | "
          f"bpp {np.mean(bpps[0]):.3f} | {mp_per_s:.2f} MP/s",
          file=sys.stderr)

    # Transport-independent codec metric (VERDICT r3 weak #1 / next #2):
    # the FULL codec (transforms + rANS both directions) with the pixel
    # wire legs excluded — input images pre-staged on device, device-array
    # results fenced by a per-image scalar fetch. Only the intrinsic
    # stream/symbol legs remain, so device-side codec wins are visible
    # and the ±15% pixel-wire wobble is not. Pinned definition; carried
    # as extra.pipelined_device_mp_s every round (r02b's "device-resident
    # inputs" 4.53 MP/s is the comparable ancestor).
    imgs_dev = [jnp.asarray(im) for im in imgs]
    _ = [int(d[0, 0, 0, 0]) for d in imgs_dev]   # fence uploads out of loop

    def device_pass():
        t0 = time.perf_counter()
        outs = codec.compress_many(imgs_dev)
        recons = codec.decompress_many(outs, as_uint8=True, as_numpy=False)
        _ = [int(r[0, 0, 0, 0]) for r in recons]  # scalar fence, no download
        return time.perf_counter() - t0

    device_pass()                                # warmup
    dev_total = float(np.median([device_pass() for _ in range(7)]))
    dev_mp_per_s = 4 * mp / dev_total
    print(f"pipelined device-resident x4 (no pixel wire legs): "
          f"{dev_total*1e3/4:.0f} ms/img | {dev_mp_per_s:.2f} MP/s",
          file=sys.stderr)

    envelope = _device_envelope(model, params, alpha)
    print(f"device envelope (eval forward roundtrip, no rANS/wire): "
          f"{envelope:.2f} MP/s", file=sys.stderr)

    # One JSON line; headline is the honest end-to-end number
    # (r02-comparable). The three metrics see different things (PERF.md
    # "What each bench metric can see"): e2e = everything incl. pixel
    # wire; pipelined_device = codec incl. rANS, minus pixel wire;
    # envelope = transforms only, no rANS/wire. They are NOT comparable
    # with each other.
    print(json.dumps({
        "metric": "codec_throughput_e2e_pipelined4x1MP",
        "value": round(mp_per_s, 3),
        "unit": "megapixels/sec/chip",
        "vs_baseline": round(mp_per_s / REFERENCE_MP_PER_S, 2),
        "extra": {
            "pipelined_device_mp_s": round(dev_mp_per_s, 3),
            "device_envelope_mp_s": round(envelope, 3),
            "serial_e2e_mp_s": round(serial, 3),
            "bpp": round(float(np.mean(bpps[0])), 4),
        },
    }))


if __name__ == "__main__":
    main()
