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
and PNG/container parsing overlap across clients, while codec work flows
through ONE dispatcher thread that drains a queue into the *pipelined*
batch APIs (`compress_many` / `decompress_many`, up to `--max_batch` at a
time). Under concurrent load, host rANS for request i therefore overlaps
device transforms for request i+1 — steady-state throughput is the
pipelined rate, not N x serial latency. A single dispatcher thread also
keeps the per-shape jit caches single-threaded (they are not
thread-safe). `--shape_bucket` caps the number of distinct compiled
shapes on mixed-size traffic exactly as in the compress CLI.
"""

import argparse
import collections
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
    p.add_argument("--max_batch", type=int, default=8,
                   help="max queued requests dispatched as one pipelined "
                        "compress_many/decompress_many call")
    p.add_argument("--batch_window_ms", type=float, default=2.0,
                   help="after the first job arrives, hold dispatch up to "
                        "this many ms so concurrent requests accumulate "
                        "into one batch (0 = dispatch immediately; the "
                        "window closes early once max_batch jobs are "
                        "queued). Bounds added latency by exactly this "
                        "value")
    p.add_argument("--pipeline_chunk", type=int, default=4,
                   help="within a batch, ride this many same-shape images "
                        "on ONE device program (one upload/dispatch/fetch "
                        "per chunk) — the lever for small-payload traffic "
                        "where per-RPC flat cost dominates; 1 disables")
    p.add_argument("--wire_chunk", type=int, default=1,
                   help="batch only the host sync points (stacked fetches/"
                        "uploads) of this many same-shape images per "
                        "dispatch; device programs stay per-image. "
                        "1 disables")
    p.add_argument("--seed", type=int, default=42)
    return p.parse_args(argv)


class _Job:
    __slots__ = ("kind", "payload", "done", "result", "error")

    def __init__(self, kind, payload):
        self.kind = kind          # "compress" | "decompress"
        self.payload = payload    # np image (1,H,W,3) | CompressionOutput
        self.done = threading.Event()
        self.result = None
        self.error = None


class CodecService:
    """Warm codec + counters; a single dispatcher thread drains the
    request queue into pipelined `compress_many`/`decompress_many` calls
    (a run of same-kind requests from the queue head, up to `max_batch`),
    so concurrent requests overlap host rANS with device compute instead
    of serializing behind one lock."""

    def __init__(self, config, params, shape_bucket=None, tile_latents=None,
                 coder_threads=1, max_batch=8, batch_window_ms=0.0,
                 pipeline_chunk=1, wire_chunk=1):
        self.codec = Codec(config, params, coder_threads=coder_threads,
                           pipeline_chunk=pipeline_chunk,
                           wire_chunk=wire_chunk)
        self.codec.build_tables()
        self.shape_bucket = shape_bucket
        self.tile_latents = tile_latents
        self.max_batch = max(1, int(max_batch))
        self.batch_window_s = max(0.0, float(batch_window_ms)) / 1e3
        self._queue = collections.deque()
        self._cv = threading.Condition()
        self._closed = False
        self._stats_lock = threading.Lock()
        self.stats = {"compress_requests": 0, "decompress_requests": 0,
                      "errors": 0, "pixels_in": 0, "bytes_hfc": 0,
                      "busy_seconds": 0.0, "batches": 0,
                      "batched_requests": 0, "max_batch_seen": 0}
        self.n_params = sum(
            int(np.prod(x.shape))
            for x in jax.tree_util.tree_leaves(params))
        self._dispatcher = threading.Thread(target=self._dispatch_loop,
                                            daemon=True,
                                            name="codec-dispatcher")
        self._dispatcher.start()

    # ------------------------------------------------------------------ #
    # dispatcher

    def _submit(self, kind, payload):
        job = _Job(kind, payload)
        with self._cv:
            if self._closed:
                raise RuntimeError("service is shut down")
            self._queue.append(job)
            self._cv.notify()
        job.done.wait()
        if job.error is not None:
            raise job.error
        return job.result

    def _dispatch_loop(self):
        while True:
            with self._cv:
                while not self._queue and not self._closed:
                    self._cv.wait()
                if self._closed and not self._queue:
                    return
                # Batching window: hold dispatch up to batch_window_s after
                # the first job arrives so concurrent requests accumulate
                # into one batch (round-4 load test saw max_batch_seen=3 at
                # 6 clients without it — the loop only batched what was
                # momentarily queued). Closes early once max_batch same-kind
                # jobs are waiting or on shutdown; added latency is bounded
                # by exactly the window.
                if self.batch_window_s > 0.0 and not self._closed:
                    kind0 = self._queue[0].kind
                    deadline = time.monotonic() + self.batch_window_s
                    while (sum(1 for j in self._queue if j.kind == kind0)
                           < self.max_batch and not self._closed):
                        remaining = deadline - time.monotonic()
                        if remaining <= 0.0:
                            break
                        self._cv.wait(remaining)
                # Pull ALL queued jobs of the head's kind (not just the
                # contiguous head run): requests are independent, so
                # cross-kind reordering is safe, and interleaved
                # compress/decompress traffic still forms full batches.
                kind = self._queue[0].kind
                batch, rest = [], collections.deque()
                while self._queue and len(batch) < self.max_batch:
                    job = self._queue.popleft()
                    (batch if job.kind == kind else rest).append(job)
                rest.extend(self._queue)
                self._queue = rest
            self._run_batch(batch)

    def _run_batch(self, batch):
        t0 = time.time()
        try:
            results = self._execute(batch[0].kind,
                                    [j.payload for j in batch])
            for job, res in zip(batch, results):
                job.result = res
        except Exception as e:  # noqa: BLE001 — a failed batch must not
            # wedge its waiters; retry individually so one poisoned
            # request can't fail its queue neighbors
            if len(batch) == 1:
                batch[0].error = e
            else:
                for job in batch:
                    try:
                        job.result = self._execute(job.kind,
                                                   [job.payload])[0]
                    except Exception as e1:  # noqa: BLE001
                        job.error = e1
        dt = time.time() - t0
        with self._stats_lock:
            self.stats["busy_seconds"] += dt
            self.stats["batches"] += 1
            self.stats["batched_requests"] += len(batch)
            self.stats["max_batch_seen"] = max(self.stats["max_batch_seen"],
                                               len(batch))
        for job in batch:
            job.done.set()

    def _execute(self, kind, payloads):
        if kind == "compress":
            return self.codec.compress_many(payloads,
                                            shape_bucket=self.shape_bucket)
        return self.codec.decompress_many(payloads, as_uint8=True,
                                          tile_latents=self.tile_latents)

    def close(self):
        with self._cv:
            self._closed = True
            self._cv.notify_all()
        self._dispatcher.join(timeout=30)

    # ------------------------------------------------------------------ #
    # request entry points (called from HTTP handler threads; parsing and
    # serialization stay here so they parallelize across clients)

    def compress(self, image_bytes: bytes):
        from PIL import Image

        img = Image.open(io.BytesIO(image_bytes)).convert("RGB")
        arr = np.asarray(img, dtype=np.uint8)[None]  # (1, H, W, 3)
        out = self._submit("compress", arr)
        data, actual_bpp, _ = dumps_compressed(out)
        with self._stats_lock:
            self.stats["compress_requests"] += 1
            self.stats["pixels_in"] += arr.shape[1] * arr.shape[2]
            self.stats["bytes_hfc"] += len(data)
        return data, {"X-Bpp": f"{actual_bpp:.4f}",
                      "X-Shape": f"{arr.shape[1]}x{arr.shape[2]}"}

    def decompress(self, hfc_bytes: bytes) -> bytes:
        from PIL import Image

        out = loads_compressed(hfc_bytes)
        recon = self._submit("decompress", out)
        buf = io.BytesIO()
        Image.fromarray(np.asarray(recon[0])).save(buf, format="PNG")
        with self._stats_lock:
            self.stats["decompress_requests"] += 1
            self.stats["bytes_hfc"] += len(hfc_bytes)
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
                with service._stats_lock:
                    service.stats["errors"] += 1
                logger.exception("request failed")
                self._json(400, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def make_server(a, logger=None):
    """Build the warm service + HTTP server (not yet serving). Split from
    main() so tests can drive a real server on an ephemeral port."""
    logger = logger or setup_logger(None, name="hific_tpu.serve")
    logger.info("Restoring %s", a.checkpoint_dir)
    try:
        config, params = checkpoints.resolve_eval_checkpoint(
            a.checkpoint_dir, seed=a.seed)
    except FileNotFoundError as e:
        raise SystemExit(str(e))
    logger.info("Building prior probability tables...")
    service = CodecService(config, params, shape_bucket=a.shape_bucket,
                           tile_latents=a.tile_latents,
                           coder_threads=a.coder_threads,
                           max_batch=a.max_batch,
                           batch_window_ms=a.batch_window_ms,
                           pipeline_chunk=a.pipeline_chunk,
                           wire_chunk=a.wire_chunk)

    class _Server(ThreadingHTTPServer):
        def server_close(self):
            super().server_close()
            service.close()

    server = _Server((a.host, a.port), make_handler(service, logger))
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
