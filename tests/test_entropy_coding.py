"""rANS coder round-trip tests (host-side, no jax)."""

import numpy as np
import pytest

from hific_tpu.entropy import ans
from hific_tpu.entropy.coding import (
    build_inverse_table,
    decode_indexed,
    decode_indexed_scalar,
    encode_indexed,
    encode_indexed_scalar,
)
from hific_tpu.ops.maths import pmf_to_quantized_cdf

PRECISION = 16


def _random_tables(n_rows, rng, max_support=12):
    """Random quantized CDFs with an overflow slot, reference layout:
    cdf rows [n_rows, max_len + 2], lengths, offsets."""
    lengths = rng.randint(3, max_support, size=n_rows) + 2  # cdf_length
    max_len = lengths.max()
    cdf = np.zeros((n_rows, max_len), dtype=np.uint32)
    offsets = rng.randint(-8, 2, size=n_rows).astype(np.int32)
    for r in range(n_rows):
        support = lengths[r] - 2          # tracked symbols
        pmf = rng.rand(support) + 1e-3
        pmf = pmf / pmf.sum() * 0.995
        pmf = np.concatenate([pmf, [0.005]])  # overflow mass
        cdf[r, : support + 2] = pmf_to_quantized_cdf(pmf, PRECISION)
    return cdf, lengths.astype(np.int32), offsets


def _random_symbols(shape, indices, lengths, offsets, rng, p_overflow=0.05):
    """Symbols mostly inside the tracked range, some outside."""
    max_values = lengths[indices] - 2
    inside = rng.randint(0, np.maximum(max_values, 1))
    symbols = inside + offsets[indices]
    outliers = rng.rand(*shape) < p_overflow
    symbols = np.where(outliers, symbols + rng.randint(-40, 40, size=shape),
                       symbols)
    return symbols.astype(np.int32)


@pytest.mark.parametrize("batch", [1, 3])
def test_vectorized_roundtrip(batch):
    rng = np.random.RandomState(0)
    n_rows = 10
    cdf, lengths, offsets = _random_tables(n_rows, rng)
    shape = (batch, 6, 7, 5)
    indices = rng.randint(0, n_rows, size=shape).astype(np.int32)
    symbols = _random_symbols(shape, indices, lengths, offsets, rng)

    encoded, coding_shape = encode_indexed(symbols, indices, cdf, lengths,
                                           offsets, PRECISION)
    assert encoded.dtype == np.uint32
    decoded = decode_indexed(encoded, indices, cdf, lengths, offsets, PRECISION)
    np.testing.assert_array_equal(decoded, symbols)


def test_scalar_roundtrip():
    rng = np.random.RandomState(1)
    n_rows = 6
    cdf, lengths, offsets = _random_tables(n_rows, rng)
    shape = (1, 4, 5, 3)
    indices = rng.randint(0, n_rows, size=shape).astype(np.int32)
    symbols = _random_symbols(shape, indices, lengths, offsets, rng, 0.1)

    encoded, _ = encode_indexed_scalar(symbols, indices, cdf, lengths,
                                       offsets, PRECISION)
    decoded = decode_indexed_scalar(encoded, indices, cdf, lengths, offsets,
                                    PRECISION)
    np.testing.assert_array_equal(decoded, symbols)


def test_extreme_overflow_values():
    """Multi-nibble overflow payloads round-trip (the reference's vectorized
    path corrupts these; ours must not)."""
    rng = np.random.RandomState(2)
    cdf, lengths, offsets = _random_tables(4, rng)
    shape = (1, 4, 2, 2)
    indices = rng.randint(0, 4, size=shape).astype(np.int32)
    symbols = _random_symbols(shape, indices, lengths, offsets, rng, 0)
    symbols[0, 0, 0, 0] = 30_000     # several nibbles
    symbols[0, 1, 0, 0] = -30_000
    symbols[0, 2, 1, 1] = 999_999

    for enc, dec in [(encode_indexed, decode_indexed),
                     (encode_indexed_scalar, decode_indexed_scalar)]:
        encoded, _ = enc(symbols, indices, cdf, lengths, offsets, PRECISION)
        decoded = dec(encoded, indices, cdf, lengths, offsets, PRECISION)
        np.testing.assert_array_equal(decoded, symbols)


def test_compression_efficiency():
    """Attained bits should be close to the Shannon entropy of the tables."""
    rng = np.random.RandomState(3)
    n_rows = 8
    cdf, lengths, offsets = _random_tables(n_rows, rng, max_support=20)
    shape = (1, 32, 16, 16)
    indices = rng.randint(0, n_rows, size=shape).astype(np.int32)

    # Sample true-to-model symbols per element from its quantized pmf.
    pmf_rows = [np.diff(cdf[r, : lengths[r]]).astype(np.float64) / (1 << PRECISION)
                for r in range(n_rows)]
    flat_idx = indices.reshape(-1)
    symbols = np.empty(flat_idx.shape, np.int32)
    entropy_bits = 0.0
    for i, r in enumerate(flat_idx):
        pmf = pmf_rows[r][:-1]  # exclude overflow slot
        pmf = pmf / pmf.sum()
        s = rng.choice(len(pmf), p=pmf)
        symbols[i] = s + offsets[r]
        entropy_bits += -np.log2(pmf_rows[r][s])
    symbols = symbols.reshape(shape)

    encoded, _ = encode_indexed(symbols, indices, cdf, lengths, offsets,
                                PRECISION)
    attained_bits = 32 * len(encoded)
    # vectorized lanes pay a constant ~64-bit/lane overhead
    overhead = 64 * 32
    assert attained_bits < entropy_bits * 1.05 + overhead
    decoded = decode_indexed(encoded, indices, cdf, lengths, offsets, PRECISION)
    np.testing.assert_array_equal(decoded, symbols)


def test_rans_core_push_pop():
    """Low-level rANS state round-trip with identity CDF."""
    rng = np.random.RandomState(4)
    lanes = (16,)
    msg = ans.empty_message(lanes)
    seq = [rng.randint(0, 15, size=lanes).astype(np.uint64) for _ in range(50)]
    for s in reversed(seq):
        ans.rans_push(msg, s, np.ones(lanes, np.uint64), 4)
    stream = ans.flatten_message(msg)
    msg2 = ans.unflatten_message(stream, lanes)
    for s in seq:
        cf, complete = ans.rans_pop(msg2, 4)
        np.testing.assert_array_equal(cf, s)
        complete(cf, np.ones(lanes, np.uint64))


# --------------------------------------------------------------------------
# Lane-sharded multithreaded coding (container v2 payloads).
# --------------------------------------------------------------------------


@pytest.mark.parametrize("shards", [2, 3, 8])
@pytest.mark.parametrize("use_native", [True, False])
def test_sharded_roundtrip(shards, use_native):
    from hific_tpu.entropy.coding import (decode_indexed_sharded,
                                          encode_indexed_sharded)

    rng = np.random.RandomState(10 + shards)
    n_rows = 10
    cdf, lengths, offsets = _random_tables(n_rows, rng)
    shape = (1, 11, 6, 5)  # 11 lanes -> uneven shard splits
    indices = rng.randint(0, n_rows, size=shape).astype(np.int32)
    symbols = _random_symbols(shape, indices, lengths, offsets, rng, 0.08)

    encoded, coding_shape = encode_indexed_sharded(
        symbols, indices, cdf, lengths, offsets, PRECISION, shards,
        use_native=use_native)
    assert int(encoded[0]) == min(shards, shape[1])
    decoded = decode_indexed_sharded(encoded, indices, cdf, lengths, offsets,
                                     PRECISION, use_native=use_native)
    np.testing.assert_array_equal(decoded, symbols)


def test_sharded_streams_equal_independent_v1_streams():
    """Each shard's substream is byte-identical to encode_indexed run on
    that lane subset alone — shard boundaries are independent entry points."""
    from hific_tpu.entropy.coding import (_lane_layout, _lane_splits,
                                          encode_indexed_sharded)

    rng = np.random.RandomState(20)
    n_rows = 7
    cdf, lengths, offsets = _random_tables(n_rows, rng)
    shape = (1, 10, 4, 6)
    indices = rng.randint(0, n_rows, size=shape).astype(np.int32)
    symbols = _random_symbols(shape, indices, lengths, offsets, rng, 0.1)

    shards = 3
    payload, _ = encode_indexed_sharded(symbols, indices, cdf, lengths,
                                        offsets, PRECISION, shards)
    k = int(payload[0])
    lens = payload[1 : 1 + k].astype(np.int64)
    off = 1 + k

    sym_l = _lane_layout(symbols)   # (P, C): lanes are channels
    idx_l = _lane_layout(indices)
    for (lo, hi), length in zip(_lane_splits(sym_l.shape[1], shards), lens):
        sub_sym = np.ascontiguousarray(sym_l[:, lo:hi])
        sub_idx = np.ascontiguousarray(idx_l[:, lo:hi])
        # Re-shape the lane subset back to (1, C', H, W) for encode_indexed.
        c = hi - lo
        h, w = shape[2], shape[3]
        sub_sym_img = sub_sym.reshape(h, w, c).transpose(2, 0, 1)[None]
        sub_idx_img = sub_idx.reshape(h, w, c).transpose(2, 0, 1)[None]
        ref, _ = encode_indexed(sub_sym_img, sub_idx_img, cdf, lengths,
                                offsets, PRECISION)
        np.testing.assert_array_equal(payload[off : off + length], ref)
        off += length


def test_sharded_native_numpy_bitstreams_identical():
    from hific_tpu.entropy import native
    from hific_tpu.entropy.coding import encode_indexed_sharded

    if not native.available():
        pytest.skip("native kernel unavailable")
    rng = np.random.RandomState(21)
    cdf, lengths, offsets = _random_tables(6, rng)
    shape = (1, 9, 5, 4)
    indices = rng.randint(0, 6, size=shape).astype(np.int32)
    symbols = _random_symbols(shape, indices, lengths, offsets, rng, 0.1)

    a, _ = encode_indexed_sharded(symbols, indices, cdf, lengths, offsets,
                                  PRECISION, 4, use_native=True)
    b, _ = encode_indexed_sharded(symbols, indices, cdf, lengths, offsets,
                                  PRECISION, 4, use_native=False)
    np.testing.assert_array_equal(a, b)


def test_sharded_multi_nibble_overflow():
    from hific_tpu.entropy.coding import (decode_indexed_sharded,
                                          encode_indexed_sharded)

    rng = np.random.RandomState(22)
    cdf, lengths, offsets = _random_tables(4, rng)
    shape = (1, 6, 3, 3)
    indices = rng.randint(0, 4, size=shape).astype(np.int32)
    symbols = _random_symbols(shape, indices, lengths, offsets, rng, 0)
    symbols[0, 0, 0, 0] = 50_000
    symbols[0, 5, 2, 2] = -123_456

    encoded, _ = encode_indexed_sharded(symbols, indices, cdf, lengths,
                                        offsets, PRECISION, 4)
    decoded = decode_indexed_sharded(encoded, indices, cdf, lengths, offsets,
                                     PRECISION)
    np.testing.assert_array_equal(decoded, symbols)


def test_shards_clamped_to_lanes():
    """More threads than lanes degrades gracefully to one stream per lane."""
    from hific_tpu.entropy.coding import (decode_indexed_sharded,
                                          encode_indexed_sharded)

    rng = np.random.RandomState(23)
    cdf, lengths, offsets = _random_tables(5, rng)
    shape = (1, 3, 4, 4)
    indices = rng.randint(0, 5, size=shape).astype(np.int32)
    symbols = _random_symbols(shape, indices, lengths, offsets, rng)

    encoded, _ = encode_indexed_sharded(symbols, indices, cdf, lengths,
                                        offsets, PRECISION, shards=16)
    assert int(encoded[0]) == 3
    decoded = decode_indexed_sharded(encoded, indices, cdf, lengths, offsets,
                                     PRECISION)
    np.testing.assert_array_equal(decoded, symbols)
