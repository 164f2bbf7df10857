"""Wire-chunked pipeline legs (codec.py wire_chunk): batching only the
host<->device SYNC POINTS — stacked packed-buffer / coding-index fetches
and stacked symbol uploads — while every device program stays per-image.

Invariants: byte-identical streams and pixel-identical reconstructions
vs the per-image (wire_chunk=1) paths, across shape breaks, odd-size
tails, the host-coder route (coder_threads>1), and forced host decode
(device_decode=False). Perf rationale in PERF.md round 5 (sync RPC
~28 ms flat on the tunneled transport; reference analog: its coder is
the serial bottleneck, src/README.md:89).
"""
import numpy as np
import pytest

import jax

from hific_tpu.codec import Codec
from tests.test_codec import TINY, tiny_codec  # noqa: F401

jax.config.update("jax_platforms", "cpu")


def _images(rng, n=4):
    imgs = [rng.randint(0, 256, size=(1, 64, 64, 3), dtype=np.uint8)
            for _ in range(n)]
    # A different shape in the middle breaks every chunking run.
    imgs.insert(2, rng.randint(0, 256, size=(1, 64, 96, 3),
                               dtype=np.uint8))
    return imgs


def _assert_outs_equal(outs, wants):
    assert len(outs) == len(wants)
    for out, want in zip(outs, wants):
        np.testing.assert_array_equal(out.hyperlatents_encoded,
                                      want.hyperlatents_encoded)
        np.testing.assert_array_equal(out.latents_encoded,
                                      want.latents_encoded)
        assert out.spatial_shape == want.spatial_shape
        np.testing.assert_allclose(out.total_bpp, want.total_bpp,
                                   rtol=1e-4)


def test_wire_chunked_device_encode_matches(tiny_codec):  # noqa: F811
    """Device-encode path with stacked result fetches: identical streams
    and pixels to the per-image pipeline, order preserved."""
    rng = np.random.RandomState(23)
    images = _images(rng)
    want_outs = tiny_codec.compress_many(images)
    want_px = tiny_codec.decompress_many(want_outs, as_uint8=True)

    tiny_codec.wire_chunk = 3
    try:
        outs = tiny_codec.compress_many(images)
        _assert_outs_equal(outs, want_outs)
        got = tiny_codec.decompress_many(outs, as_uint8=True)
    finally:
        tiny_codec.wire_chunk = 1
    for g, w in zip(got, want_px):
        np.testing.assert_array_equal(g, w)


def test_wire_chunked_host_paths_match(tiny_codec):  # noqa: F811
    """Host-coder encode (threaded, sharded streams) + forced host decode
    with chunked wire legs: streams match the unchunked host coder;
    pixels match decompress()."""
    rng = np.random.RandomState(29)
    images = _images(rng, n=3)

    plain = Codec(tiny_codec.config, tiny_codec.params, coder_threads=2)
    wired = Codec(tiny_codec.config, tiny_codec.params, coder_threads=2,
                  wire_chunk=4)
    for c in (plain, wired):
        c.factorized.tables = tiny_codec.factorized.tables
        c.factorized.medians = tiny_codec.factorized.medians
        c._tables_built = True

    want_outs = plain.compress_many(images)
    outs = wired.compress_many(images)
    _assert_outs_equal(outs, want_outs)

    want_px = [plain.decompress(o, as_uint8=True) for o in want_outs]
    got = wired.decompress_many(outs, as_uint8=True, device_decode=False)
    for g, w in zip(got, want_px):
        np.testing.assert_array_equal(np.asarray(g), w)


def test_wire_chunked_forced_host_decode_on_device_streams(tiny_codec):  # noqa: F811,E501
    """device_decode=False routes device-encoded (unsharded) payloads
    through the wire-chunked host decode; pixels must equal the device
    decode of the same streams."""
    rng = np.random.RandomState(31)
    images = _images(rng, n=3)
    outs = tiny_codec.compress_many(images)
    want = tiny_codec.decompress_many(outs, as_uint8=True)

    tiny_codec.wire_chunk = 2
    try:
        got = tiny_codec.decompress_many(outs, as_uint8=True,
                                         device_decode=False)
    finally:
        tiny_codec.wire_chunk = 1
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), w)


def test_device_decode_flag_validation(tiny_codec):  # noqa: F811
    """device_decode=True on an ineligible payload (sharded streams) is a
    hard error, mirroring decompress()."""
    rng = np.random.RandomState(37)
    x = rng.randint(0, 256, size=(1, 64, 64, 3), dtype=np.uint8)
    sharded = Codec(tiny_codec.config, tiny_codec.params, coder_threads=2)
    sharded.factorized.tables = tiny_codec.factorized.tables
    sharded.factorized.medians = tiny_codec.factorized.medians
    sharded._tables_built = True
    out = sharded.compress(x)
    with pytest.raises(ValueError):
        sharded.decompress_many([out], device_decode=True)
