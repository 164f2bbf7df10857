"""Serving-daemon load test: measure HTTP throughput serial vs concurrent.

Starts a warm server in-process on an ephemeral port, then drives it:
  phase 1 — ONE client compresses+decompresses `--n_images` images
            back-to-back (serial latency baseline);
  phase 2 — `--clients` concurrent clients send the same traffic
            (the micro-batching dispatcher should overlap host rANS with
            device compute, so throughput > serial).

Run on the TPU box (the overlap being measured is host-coder vs device
compute; a CPU-jax run measures only queueing overhead):

    python scripts/serve_load.py -ckpt experiments/.../checkpoints \
        [--size 512] [--n_images 8] [--clients 4]

Prints a JSON line with serial/concurrent MP/s and the speedup.
"""

import argparse
import io
import json
import os
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("-ckpt", "--checkpoint_dir", required=True)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--n_images", type=int, default=8)
    p.add_argument("--clients", type=int, default=4)
    p.add_argument("--shape_bucket", type=int, default=None)
    p.add_argument("--coder_threads", type=int, default=1)
    p.add_argument("--batch_window_ms", type=float, default=None,
                   help="dispatcher batching window (None = serve default)")
    p.add_argument("--pipeline_chunk", type=int, default=None,
                   help="codec pipeline_chunk for the server (None = serve "
                        "default)")
    p.add_argument("--wire_chunk", type=int, default=None,
                   help="codec wire_chunk for the server (None = serve "
                        "default)")
    return p.parse_args()


def _post(url, body):
    req = urllib.request.Request(url, data=body, method="POST")
    with urllib.request.urlopen(req) as r:
        return r.read()


def make_payloads(n, size):
    from PIL import Image

    rng = np.random.RandomState(0)
    # smooth-ish content so bpp is realistic, not noise-worst-case
    payloads = []
    for _ in range(n):
        base = rng.rand(size // 16, size // 16, 3)
        arr = np.asarray(Image.fromarray(
            (base * 255).astype(np.uint8)).resize((size, size),
                                                  Image.BILINEAR))
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        payloads.append(buf.getvalue())
    return payloads


def run_traffic(base, payloads, n_clients):
    """Each client round-trips its share of payloads; returns elapsed."""
    shares = [payloads[i::n_clients] for i in range(n_clients)]
    errors = []

    def client(share):
        try:
            for p in share:
                hfc = _post(base + "/compress", p)
                _post(base + "/decompress", hfc)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=client, args=(s,)) for s in shares]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.time() - t0
    if errors:
        raise RuntimeError(errors[0])
    return dt


def main():
    a = parse_args()
    from hific_tpu.cli import serve as serve_cli

    sargs = ["-ckpt", a.checkpoint_dir, "--port", "0",
             "--coder_threads", str(a.coder_threads)]
    if a.shape_bucket:
        sargs += ["--shape_bucket", str(a.shape_bucket)]
    if a.batch_window_ms is not None:
        sargs += ["--batch_window_ms", str(a.batch_window_ms)]
    if a.pipeline_chunk is not None:
        sargs += ["--pipeline_chunk", str(a.pipeline_chunk)]
    if a.wire_chunk is not None:
        sargs += ["--wire_chunk", str(a.wire_chunk)]
    server = serve_cli.make_server(serve_cli.parse_args(sargs))
    threading.Thread(target=server.serve_forever, daemon=True).start()
    host, port = server.server_address[:2]
    base = f"http://{host}:{port}"

    payloads = make_payloads(a.n_images, a.size)
    mp_total = a.n_images * a.size * a.size / 1e6

    # warmup: compile compress+decompress programs once
    hfc = _post(base + "/compress", payloads[0])
    _post(base + "/decompress", hfc)

    serial_s = run_traffic(base, payloads, 1)
    conc_s = run_traffic(base, payloads, a.clients)
    server.shutdown()
    server.server_close()

    result = {
        "n_images": a.n_images, "size": a.size, "clients": a.clients,
        "serial_mp_s": round(mp_total / serial_s, 3),
        "concurrent_mp_s": round(mp_total / conc_s, 3),
        "speedup": round(serial_s / conc_s, 3),
        "stats": server.service.stats,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
