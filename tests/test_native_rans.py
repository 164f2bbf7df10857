"""Native (C++) rANS kernel: bitstream equality with the numpy path."""

import numpy as np
import pytest

from hific_tpu.entropy import native
from hific_tpu.entropy.coding import decode_indexed, encode_indexed
from tests.test_entropy_coding import (
    PRECISION,
    _random_symbols,
    _random_tables,
)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


@pytest.mark.parametrize("batch", [1, 2])
def test_native_bitstream_matches_numpy(batch):
    rng = np.random.RandomState(0)
    cdf, lengths, offsets = _random_tables(12, rng)
    shape = (batch, 8, 9, 7)
    indices = rng.randint(0, 12, size=shape).astype(np.int32)
    symbols = _random_symbols(shape, indices, lengths, offsets, rng, 0.08)

    enc_np, cs_np = encode_indexed(symbols, indices, cdf, lengths, offsets,
                                   PRECISION, use_native=False)
    enc_cc, cs_cc = encode_indexed(symbols, indices, cdf, lengths, offsets,
                                   PRECISION, use_native=True)
    assert cs_np == cs_cc
    np.testing.assert_array_equal(enc_np, enc_cc)

    # cross-decode both ways
    dec_np = decode_indexed(enc_cc, indices, cdf, lengths, offsets, PRECISION,
                            use_native=False)
    dec_cc = decode_indexed(enc_np, indices, cdf, lengths, offsets, PRECISION,
                            use_native=True)
    np.testing.assert_array_equal(dec_np, symbols)
    np.testing.assert_array_equal(dec_cc, symbols)


def test_native_extreme_overflow():
    rng = np.random.RandomState(1)
    cdf, lengths, offsets = _random_tables(4, rng)
    shape = (1, 4, 3, 3)
    indices = rng.randint(0, 4, size=shape).astype(np.int32)
    symbols = _random_symbols(shape, indices, lengths, offsets, rng, 0)
    symbols[0, 0, 0, 0] = 123_456
    symbols[0, 1, 1, 1] = -987_654
    symbols[0, 2, 0, 0] = lengths[indices[0, 2, 0, 0]] - 2  # exact boundary

    enc_np, _ = encode_indexed(symbols, indices, cdf, lengths, offsets,
                               PRECISION, use_native=False)
    enc_cc, _ = encode_indexed(symbols, indices, cdf, lengths, offsets,
                               PRECISION, use_native=True)
    np.testing.assert_array_equal(enc_np, enc_cc)
    dec = decode_indexed(enc_cc, indices, cdf, lengths, offsets, PRECISION,
                         use_native=True)
    np.testing.assert_array_equal(dec, symbols)


def test_native_pmf_to_quantized_cdf_matches_python():
    from hific_tpu.ops.maths import pmf_to_quantized_cdf

    rng = np.random.RandomState(2)
    for _ in range(10):
        n = rng.randint(2, 50)
        pmf = rng.rand(n)
        pmf[rng.randint(n)] = 1e-12  # force a steal
        got = native.pmf_to_quantized_cdf_native(pmf, 16)
        want = pmf_to_quantized_cdf(pmf, 16)
        np.testing.assert_array_equal(got, want)


def test_native_speedup():
    """The native path should beat numpy by a wide margin on realistic
    sizes (220 lanes x 4096 positions ~ a 1MP image's latents)."""
    import time

    rng = np.random.RandomState(3)
    cdf, lengths, offsets = _random_tables(64, rng, max_support=24)
    shape = (1, 220, 64, 64)
    indices = rng.randint(0, 64, size=shape).astype(np.int32)
    symbols = _random_symbols(shape, indices, lengths, offsets, rng, 0.01)

    t0 = time.perf_counter()
    enc_cc, _ = encode_indexed(symbols, indices, cdf, lengths, offsets,
                               PRECISION, use_native=True)
    t_native = time.perf_counter() - t0

    t0 = time.perf_counter()
    enc_np, _ = encode_indexed(symbols, indices, cdf, lengths, offsets,
                               PRECISION, use_native=False)
    t_numpy = time.perf_counter() - t0

    np.testing.assert_array_equal(enc_np, enc_cc)
    assert t_native < t_numpy, (t_native, t_numpy)
    print(f"native {t_native*1e3:.1f}ms vs numpy {t_numpy*1e3:.1f}ms "
          f"({t_numpy/t_native:.1f}x)")
