"""On-device rANS encode vs the host encoder: byte-exact stream equality.

The device scan must emit exactly the stream of coding.encode_indexed
(and therefore the C++ kernel and the reference coder) — heads, spill
chunk order, overflow marker/nibble rounds, everything.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from hific_tpu.entropy.coding import decode_indexed, encode_indexed
from hific_tpu.entropy.device_encode import assemble_stream, encode_scan
from tests.test_entropy_coding import _random_symbols, _random_tables

PRECISION = 16


def _device_encode(symbols, indices, cdf, lengths, offsets, **kw):
    _, c, h, w = symbols.shape
    sym_l = symbols[0].transpose(1, 2, 0).reshape(h * w, c).astype(np.int32)
    idx_l = indices[0].transpose(1, 2, 0).reshape(h * w, c).astype(np.int32)
    out = encode_scan(jnp.asarray(sym_l), jnp.asarray(idx_l),
                      jnp.asarray(np.ascontiguousarray(cdf, np.int64),
                                  jnp.int32),
                      jnp.asarray(lengths, jnp.int32),
                      jnp.asarray(offsets, jnp.int32), PRECISION, **kw)
    hi, lo, spill, lens, s_cur, e_cur = [np.asarray(a) for a in out]
    assert int(s_cur) <= spill.shape[0] and int(e_cur) <= lens.shape[0]
    return assemble_stream(hi, lo, spill, lens, int(s_cur), int(e_cur))


@pytest.mark.parametrize("seed,p_overflow", [(0, 0.0), (1, 0.08), (2, 0.3)])
def test_device_encode_matches_host(seed, p_overflow):
    rng = np.random.RandomState(seed)
    n_rows = 12
    cdf, lengths, offsets = _random_tables(n_rows, rng)
    shape = (1, 9, 8, 6)
    indices = rng.randint(0, n_rows, size=shape).astype(np.int32)
    symbols = _random_symbols(shape, indices, lengths, offsets, rng,
                              p_overflow)

    host, _ = encode_indexed(symbols, indices, cdf, lengths, offsets,
                             PRECISION)
    dev = _device_encode(symbols, indices, cdf, lengths, offsets)
    np.testing.assert_array_equal(dev, host)


def test_device_encode_multi_nibble_and_edge_payloads():
    """Escapes spanning marker continuation rounds (width >= 15) and the
    zero-width payload (value == max exactly) — byte equality + decode."""
    rng = np.random.RandomState(3)
    cdf, lengths, offsets = _random_tables(5, rng)
    shape = (1, 6, 4, 4)
    indices = rng.randint(0, 5, size=shape).astype(np.int32)
    symbols = _random_symbols(shape, indices, lengths, offsets, rng, 0)
    symbols[0, 0, 0, 0] = 30_000
    symbols[0, 1, 1, 1] = -30_000
    symbols[0, 2, 2, 2] = 999_999
    # value == max_value exactly: overflow code with zero-width payload
    r = indices[0, 3, 3, 3]
    symbols[0, 3, 3, 3] = (lengths[r] - 2) + offsets[r]

    host, _ = encode_indexed(symbols, indices, cdf, lengths, offsets,
                             PRECISION)
    dev = _device_encode(symbols, indices, cdf, lengths, offsets)
    np.testing.assert_array_equal(dev, host)
    decoded = decode_indexed(dev, indices, cdf, lengths, offsets, PRECISION)
    np.testing.assert_array_equal(decoded, symbols)


def test_device_encode_capacity_reporting():
    """Tiny spill cap: the kernel must report the true spill count so the
    caller can detect overflow and fall back (buffer itself just drops)."""
    rng = np.random.RandomState(4)
    cdf, lengths, offsets = _random_tables(6, rng)
    shape = (1, 8, 16, 16)
    indices = rng.randint(0, 6, size=shape).astype(np.int32)
    symbols = _random_symbols(shape, indices, lengths, offsets, rng, 0.05)

    sym_l = symbols[0].transpose(1, 2, 0).reshape(-1, 8).astype(np.int32)
    idx_l = indices[0].transpose(1, 2, 0).reshape(-1, 8).astype(np.int32)
    out = encode_scan(jnp.asarray(sym_l), jnp.asarray(idx_l),
                      jnp.asarray(cdf.astype(np.int64), jnp.int32),
                      jnp.asarray(lengths, jnp.int32),
                      jnp.asarray(offsets, jnp.int32), PRECISION,
                      spill_cap=8)
    s_cur = int(np.asarray(out[4]))
    assert s_cur > 8  # true demand reported even though the buffer dropped
