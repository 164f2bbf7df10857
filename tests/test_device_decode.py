"""On-device rANS decode vs the host decoder: bit-exact equality.

The device scan must reproduce coding.decode_indexed (and therefore the
C++ kernel and the reference coder) on the SAME v1 streams, including
overflow escapes with multi-nibble payloads and shared-tail refills.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from hific_tpu.entropy.coding import (
    build_inverse_table,
    decode_indexed,
    encode_indexed,
)
from hific_tpu.entropy.device_decode import (
    build_device_tables,
    decode_scan,
    pack_decode_input,
    unpack_decode_input,
)
from tests.test_entropy_coding import _random_symbols, _random_tables

PRECISION = 16


def _device_decode(encoded, indices, cdf, lengths, offsets):
    """Lane layout + device tables + scan, returning (1,C,H,W) symbols."""
    _, c, h, w = indices.shape
    inv = build_inverse_table(cdf, lengths, PRECISION)
    dt = build_device_tables(cdf, lengths, offsets, inv)
    idx_l = indices[0].transpose(1, 2, 0).reshape(h * w, c).astype(np.int32)
    out = decode_scan(jnp.asarray(encoded, jnp.uint32), jnp.asarray(idx_l),
                      jnp.asarray(dt.t_pair),
                      jnp.asarray(dt.maxv), jnp.asarray(dt.offs))
    return np.asarray(out).reshape(h, w, c).transpose(2, 0, 1)[None]


@pytest.mark.parametrize("seed,p_overflow", [(0, 0.0), (1, 0.08), (2, 0.3)])
def test_device_decode_matches_host(seed, p_overflow):
    rng = np.random.RandomState(seed)
    n_rows = 12
    cdf, lengths, offsets = _random_tables(n_rows, rng)
    shape = (1, 9, 8, 6)
    indices = rng.randint(0, n_rows, size=shape).astype(np.int32)
    symbols = _random_symbols(shape, indices, lengths, offsets, rng,
                              p_overflow)

    encoded, _ = encode_indexed(symbols, indices, cdf, lengths, offsets,
                                PRECISION)
    host = decode_indexed(encoded, indices, cdf, lengths, offsets, PRECISION)
    np.testing.assert_array_equal(host, symbols)
    dev = _device_decode(encoded, indices, cdf, lengths, offsets)
    np.testing.assert_array_equal(dev, symbols)


def test_device_decode_multi_nibble_overflow():
    """Escapes whose payloads span several 4-bit nibbles (incl. the 15-wide
    marker continuation), decoded on device."""
    rng = np.random.RandomState(3)
    cdf, lengths, offsets = _random_tables(5, rng)
    shape = (1, 6, 4, 4)
    indices = rng.randint(0, 5, size=shape).astype(np.int32)
    symbols = _random_symbols(shape, indices, lengths, offsets, rng, 0)
    symbols[0, 0, 0, 0] = 30_000
    symbols[0, 1, 1, 1] = -30_000
    symbols[0, 2, 2, 2] = 999_999      # several nibbles + marker rounds
    symbols[0, 3, 3, 3] = -999_999

    encoded, _ = encode_indexed(symbols, indices, cdf, lengths, offsets,
                                PRECISION)
    dev = _device_decode(encoded, indices, cdf, lengths, offsets)
    np.testing.assert_array_equal(dev, symbols)


def test_device_decode_padded_stream():
    """Zero-padding past the true stream end must not change the result
    (upload buffers are bucketed)."""
    rng = np.random.RandomState(4)
    cdf, lengths, offsets = _random_tables(8, rng)
    shape = (1, 7, 5, 5)
    indices = rng.randint(0, 8, size=shape).astype(np.int32)
    symbols = _random_symbols(shape, indices, lengths, offsets, rng, 0.1)

    encoded, _ = encode_indexed(symbols, indices, cdf, lengths, offsets,
                                PRECISION)
    padded = np.concatenate([encoded, np.zeros(513, np.uint32)])
    dev = _device_decode(padded, indices, cdf, lengths, offsets)
    np.testing.assert_array_equal(dev, symbols)


def test_pack_unpack_roundtrip():
    """uint8 single-upload packing: int16 z symbols + uint32 stream survive
    the bitcast exactly (byte order included)."""
    rng = np.random.RandomState(5)
    z = rng.randint(-300, 300, size=(1, 3, 4, 5)).astype(np.int16)
    stream = rng.randint(0, 2 ** 32, size=777, dtype=np.uint64).astype(
        np.uint32)
    buf = pack_decode_input(z, stream)
    z2, s2 = unpack_decode_input(jnp.asarray(buf), z.shape)
    np.testing.assert_array_equal(np.asarray(z2), z)
    np.testing.assert_array_equal(np.asarray(s2)[: len(stream)], stream)
    assert len(np.asarray(s2)) >= len(stream)
