"""HTTP serving daemon (cli/serve.py): drive a real server on an
ephemeral port — compress an image over HTTP, get `.hfc` bytes back,
decompress them over HTTP, and match the direct Codec paths exactly."""

import io
import json
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from hific_tpu.config import mse_lpips_config
from hific_tpu.training import checkpoints
from hific_tpu.training.train_step import create_train_state

TINY = dict(latent_channels=8, n_residual_blocks=1, hyperlatent_filters=16)

# the shared server fixture compiles compress+decompress programs (~1 min
# on the CI box) -> slow tier, like the other end-to-end CLI tests
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    from hific_tpu.cli import serve as serve_cli

    ckpt_dir = str(tmp_path_factory.mktemp("ckpt"))
    config = mse_lpips_config(**TINY)
    state = create_train_state(config, jax.random.PRNGKey(0))
    checkpoints.save_checkpoint(ckpt_dir, state, config, step=1)

    a = serve_cli.parse_args(["-ckpt", ckpt_dir, "--port", "0"])
    server = serve_cli.make_server(a)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    host, port = server.server_address[:2]
    yield f"http://{host}:{port}", server.service
    server.shutdown()
    server.server_close()


def _post(url, body):
    req = urllib.request.Request(url, data=body, method="POST")
    with urllib.request.urlopen(req) as r:
        return r.status, r.read(), dict(r.headers)


def test_serve_roundtrip_matches_codec(served):
    from PIL import Image

    base, service = served

    # health first: model restored, tables built
    with urllib.request.urlopen(base + "/healthz") as r:
        health = json.loads(r.read())
    assert health["status"] == "ok" and health["tables_built"]

    rng = np.random.RandomState(0)
    arr = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")

    status, hfc, headers = _post(base + "/compress", buf.getvalue())
    assert status == 200
    assert float(headers["X-Bpp"]) > 0
    assert headers["X-Shape"] == "48x64"

    # the served payload is byte-identical to the direct Codec container
    from hific_tpu.entropy.container import dumps_compressed

    direct = service.codec.compress(arr[None])
    want, _, _ = dumps_compressed(direct)
    assert hfc == want

    status, png, _ = _post(base + "/decompress", hfc)
    assert status == 200
    got = np.asarray(Image.open(io.BytesIO(png)))
    want_img = np.asarray(service.codec.decompress(direct, as_uint8=True))[0]
    np.testing.assert_array_equal(got, want_img)

    # counters moved
    with urllib.request.urlopen(base + "/stats") as r:
        stats = json.loads(r.read())
    assert stats["compress_requests"] == 1
    assert stats["decompress_requests"] == 1
    assert stats["errors"] == 0


def test_container_bytes_roundtrip_v1_and_v2():
    """dumps/loads match the file format for both container versions."""
    from hific_tpu.entropy.container import (CompressionOutput,
                                             dumps_compressed,
                                             load_compressed,
                                             loads_compressed,
                                             save_compressed)

    rng = np.random.RandomState(0)
    for sharded in (False, True):
        out = CompressionOutput(
            hyperlatents_encoded=rng.randint(0, 2**32, 37, dtype=np.uint32),
            latents_encoded=rng.randint(0, 2**32, 211, dtype=np.uint32),
            hyperlatent_spatial_shape=(3, 4),
            spatial_shape=(48, 64),
            hyper_coding_shape=(1, 8, 12),
            latent_coding_shape=(1, 12, 16),
            batch_shape=1,
            sharded=sharded,
        )
        data, bpp, _ = dumps_compressed(out)
        back = loads_compressed(data)
        assert back.sharded == sharded
        np.testing.assert_array_equal(back.hyperlatents_encoded,
                                      out.hyperlatents_encoded)
        np.testing.assert_array_equal(back.latents_encoded,
                                      out.latents_encoded)
        assert back.spatial_shape == out.spatial_shape
        assert back.latent_coding_shape == out.latent_coding_shape
        # bytes == the file path's bytes
        import tempfile

        with tempfile.NamedTemporaryFile(suffix=".hfc") as f:
            f_bpp, _ = save_compressed(out, f.name)
            assert open(f.name, "rb").read() == data
            assert abs(f_bpp - bpp) < 1e-9
            file_back = load_compressed(f.name)
            np.testing.assert_array_equal(file_back.latents_encoded,
                                          back.latents_encoded)


def test_serve_concurrent_clients_batch_through_pipeline(served):
    """N concurrent clients: every response byte-correct, no errors, and
    the dispatcher's batch path exercised. Batch *size* under live HTTP
    timing is nondeterministic, so the deterministic batch-equivalence
    check runs against the service layer below
    (test_dispatcher_batches_match_serial)."""
    from PIL import Image

    base, service = served
    rng = np.random.RandomState(1)
    images = [(rng.rand(48, 64, 3) * 255).astype(np.uint8) for _ in range(6)]
    payloads = []
    for arr in images:
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        payloads.append(buf.getvalue())

    results = [None] * len(payloads)
    errors = []

    def client(i):
        try:
            s, hfc, _ = _post(base + "/compress", payloads[i])
            assert s == 200
            s, png, _ = _post(base + "/decompress", hfc)
            assert s == 200
            results[i] = (hfc, png)
        except Exception as e:  # noqa: BLE001 — collected for the assert
            errors.append((i, e))

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(len(payloads))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, errors

    from hific_tpu.entropy.container import dumps_compressed

    for arr, (hfc, png) in zip(images, results):
        direct = service.codec.compress(arr[None])
        want, _, _ = dumps_compressed(direct)
        assert hfc == want
        got = np.asarray(Image.open(io.BytesIO(png)))
        want_img = np.asarray(
            service.codec.decompress(direct, as_uint8=True))[0]
        np.testing.assert_array_equal(got, want_img)
    assert service.stats["errors"] == 0
    assert service.stats["batches"] >= 1


def test_dispatcher_batches_match_serial(served):
    """Deterministic batch-path check: hand the dispatcher a multi-job
    batch directly and require results identical to serial codec calls —
    compress batches ride compress_many, decompress batches ride
    decompress_many."""
    from hific_tpu.cli.serve import _Job
    from hific_tpu.entropy.container import dumps_compressed

    _, service = served
    rng = np.random.RandomState(2)
    arrs = [(rng.rand(48, 64, 3) * 255).astype(np.uint8)[None]
            for _ in range(3)]

    jobs = [_Job("compress", a) for a in arrs]
    service._run_batch(jobs)
    for job, a in zip(jobs, arrs):
        assert job.error is None
        want, _, _ = dumps_compressed(service.codec.compress(a))
        got, _, _ = dumps_compressed(job.result)
        assert got == want

    djobs = [_Job("decompress", job.result) for job in jobs]
    service._run_batch(djobs)
    for djob, job in zip(djobs, jobs):
        assert djob.error is None
        want_img = np.asarray(
            service.codec.decompress(job.result, as_uint8=True))
        np.testing.assert_array_equal(np.asarray(djob.result), want_img)


def test_serve_bad_payload_is_a_400_not_a_crash(served):
    base, service = served
    req = urllib.request.Request(base + "/decompress", data=b"not a container",
                                 method="POST")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req)
    assert ei.value.code == 400
    # server still alive
    with urllib.request.urlopen(base + "/healthz") as r:
        assert json.loads(r.read())["status"] == "ok"
