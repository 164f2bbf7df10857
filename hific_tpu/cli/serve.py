"""HTTP serving daemon: compress / decompress over the wire, model warm.

The reference ships batch CLIs only (compress.py); a production codec is
a service — the model restore (~seconds) and XLA compiles (~30-60 s cold)
must be paid once, not per request. This daemon keeps one warm `Codec`
(tables built, programs cached per image shape) behind a tiny stdlib HTTP
server:

    python -m hific_tpu.cli.serve -ckpt experiments/.../checkpoints \
        [--host 127.0.0.1] [--port 8080] [--shape_bucket 512]

    POST /compress     image bytes (PNG/JPEG/...) -> `.hfc` container bytes
                       (X-Bpp / X-Shape response headers)
    POST /decompress   `.hfc` bytes -> PNG bytes
    GET  /healthz      liveness + model info (JSON)
    GET  /stats        request/byte/latency counters (JSON)

Requests are served by a thread pool (ThreadingHTTPServer) so network I/O
overlaps device work, while a single lock serializes codec calls — the
TPU runs one program at a time anyway, and the per-shape jit caches are
not thread-safe. `--shape_bucket` caps the number of distinct compiled
shapes on mixed-size traffic exactly as in the compress CLI.
"""

import argparse
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax
import numpy as np

from hific_tpu.codec import Codec
from hific_tpu.entropy.container import dumps_compressed, loads_compressed
from hific_tpu.training import checkpoints
from hific_tpu.utils.logging import setup_logger


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="HiFiC TPU codec server")
    p.add_argument("-ckpt", "--checkpoint_dir", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080,
                   help="0 picks a free port (printed at startup)")
    p.add_argument("--shape_bucket", type=int, default=None,
                   help="reflect-pad request images to multiples of this "
                        "(bounds compile count on mixed-size traffic)")
    p.add_argument("--tile_latents", type=int, default=None,
                   help="decode very large images on latent tiles")
    p.add_argument("--coder_threads", type=int, default=1)
    p.add_argument("--seed", type=int, default=42)
    return p.parse_args(argv)


class CodecService:
    """Warm codec + counters; one lock serializes device work."""

    def __init__(self, config, params, shape_bucket=None, tile_latents=None,
                 coder_threads=1):
        self.codec = Codec(config, params, coder_threads=coder_threads)
        self.codec.build_tables()
        self.shape_bucket = shape_bucket
        self.tile_latents = tile_latents
        self.lock = threading.Lock()
        self.stats = {"compress_requests": 0, "decompress_requests": 0,
                      "errors": 0, "pixels_in": 0, "bytes_hfc": 0,
                      "busy_seconds": 0.0}
        self.n_params = sum(
            int(np.prod(x.shape))
            for x in jax.tree_util.tree_leaves(params))

    def compress(self, image_bytes: bytes):
        from PIL import Image

        img = Image.open(io.BytesIO(image_bytes)).convert("RGB")
        arr = np.asarray(img, dtype=np.uint8)[None]  # (1, H, W, 3)
        t0 = time.time()
        with self.lock:
            out = self.codec.compress(arr, shape_bucket=self.shape_bucket)
        dt = time.time() - t0
        data, actual_bpp, _ = dumps_compressed(out)
        self.stats["compress_requests"] += 1
        self.stats["pixels_in"] += arr.shape[1] * arr.shape[2]
        self.stats["bytes_hfc"] += len(data)
        self.stats["busy_seconds"] += dt
        return data, {"X-Bpp": f"{actual_bpp:.4f}",
                      "X-Shape": f"{arr.shape[1]}x{arr.shape[2]}"}

    def decompress(self, hfc_bytes: bytes) -> bytes:
        from PIL import Image

        out = loads_compressed(hfc_bytes)
        t0 = time.time()
        with self.lock:
            recon = self.codec.decompress(out, as_uint8=True,
                                          tile_latents=self.tile_latents)
        dt = time.time() - t0
        buf = io.BytesIO()
        Image.fromarray(np.asarray(recon[0])).save(buf, format="PNG")
        self.stats["decompress_requests"] += 1
        self.stats["bytes_hfc"] += len(hfc_bytes)
        self.stats["busy_seconds"] += dt
        return buf.getvalue()

    def health(self) -> dict:
        return {"status": "ok", "params_m": round(self.n_params / 1e6, 1),
                "tables_built": bool(self.codec._tables_built)}


def make_handler(service, logger):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # route to our logger
            logger.info("%s %s", self.address_string(), fmt % args)

        def _reply(self, code, body: bytes, ctype, headers=None):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            for k, v in (headers or {}).items():
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def _json(self, code, obj):
            self._reply(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, service.health())
            elif self.path == "/stats":
                self._json(200, service.stats)
            else:
                self._json(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n)
            try:
                if self.path == "/compress":
                    data, headers = service.compress(body)
                    self._reply(200, data, "application/octet-stream",
                                headers)
                elif self.path == "/decompress":
                    png = service.decompress(body)
                    self._reply(200, png, "image/png")
                else:
                    self._json(404, {"error": f"unknown path {self.path}"})
            except Exception as e:  # noqa: BLE001 — a bad request must not
                # take the server down; the error reaches the client
                service.stats["errors"] += 1
                logger.exception("request failed")
                self._json(400, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def make_server(a, logger=None):
    """Build the warm service + HTTP server (not yet serving). Split from
    main() so tests can drive a real server on an ephemeral port."""
    logger = logger or setup_logger(None, name="hific_tpu.serve")
    config = checkpoints.load_config(a.checkpoint_dir)
    if config is None:
        raise SystemExit(f"no config.json in {a.checkpoint_dir}")
    ckpt_path = checkpoints.latest_checkpoint(a.checkpoint_dir)
    if ckpt_path is None:
        raise SystemExit(f"no step_N checkpoints in {a.checkpoint_dir}")
    logger.info("Restoring %s", ckpt_path)
    params = checkpoints.restore_params(ckpt_path, config,
                                        jax.random.PRNGKey(a.seed))
    logger.info("Building prior probability tables...")
    service = CodecService(config, params, shape_bucket=a.shape_bucket,
                           tile_latents=a.tile_latents,
                           coder_threads=a.coder_threads)
    server = ThreadingHTTPServer((a.host, a.port),
                                 make_handler(service, logger))
    server.service = service
    return server


def main(argv=None):
    a = parse_args(argv)
    logger = setup_logger(None, name="hific_tpu.serve")
    server = make_server(a, logger)
    host, port = server.server_address[:2]
    logger.info("Serving on http://%s:%d (POST /compress, /decompress; "
                "GET /healthz, /stats)", host, port)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        logger.info("Shutting down")
    finally:
        server.server_close()


if __name__ == "__main__":
    main()
