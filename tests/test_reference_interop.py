"""Cross-framework bitstream interop: our coder vs the reference coder.

Uses the PUBLIC reference implementation at /root/reference (read-only) as a
test oracle: identical inputs must produce byte-identical rANS streams, and
each side must decode the other's output. Skipped when the reference tree
isn't mounted.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "src")),
    reason="reference tree not mounted")


@pytest.fixture(scope="module")
def ref_modules():
    """Import the reference coder with functional autograd/torchvision
    stand-ins (tests/ref_stubs.py) so even its masked-overflow writeback
    path runs as an oracle."""
    from ref_stubs import install_reference_stubs

    install_reference_stubs()
    sys.path.insert(0, REFERENCE)
    try:
        from src.compression import ans as ref_ans
        from src.compression import entropy_coding as ref_coding
    finally:
        sys.path.remove(REFERENCE)
    return ref_ans, ref_coding


def test_rans_core_stream_equality(ref_modules):
    """The 64-bit vectorized rANS state machines produce identical words."""
    ref_ans, _ = ref_modules
    from hific_tpu.entropy import ans as our_ans

    rng = np.random.RandomState(0)
    lanes = (7,)
    precision = 12
    seq = [(rng.randint(0, (1 << precision) - 16, size=lanes).astype(np.uint64),
            rng.randint(1, 16, size=lanes).astype(np.uint64))
           for _ in range(200)]

    ref_msg = ref_ans.empty_message(lanes)
    for starts, freqs in seq:
        ref_msg = ref_ans.push(ref_msg, starts, freqs, precision)
    ref_stream = ref_ans.flatten(ref_msg)

    our_msg = our_ans.empty_message(lanes)
    for starts, freqs in seq:
        our_ans.rans_push(our_msg, starts, freqs, precision)
    our_stream = our_ans.flatten_message(our_msg)

    np.testing.assert_array_equal(ref_stream, our_stream)

    # and our decoder pops the reference's stream
    msg = our_ans.unflatten_message(ref_stream, lanes)
    for starts, freqs in reversed(seq):
        cf, complete = our_ans.rans_pop(msg, precision)
        assert np.all(cf >= starts) and np.all(cf < starts + freqs)
        complete(starts, freqs)


def _tables_and_symbols(with_overflow):
    from hific_tpu.ops.maths import pmf_to_quantized_cdf

    rng = np.random.RandomState(7)
    n_rows = 6
    lengths = rng.randint(4, 12, size=n_rows).astype(np.int32) + 2
    max_len = lengths.max()
    cdf = np.zeros((n_rows, max_len), np.uint32)
    offsets = rng.randint(-4, 2, size=n_rows).astype(np.int32)
    for r in range(n_rows):
        support = lengths[r] - 2
        pmf = rng.rand(support) + 0.05
        pmf = pmf / pmf.sum() * 0.98
        cdf[r, : support + 2] = pmf_to_quantized_cdf(
            np.concatenate([pmf, [0.02]]), 16)
    shape = (1, 4, 5, 5)
    indices = rng.randint(0, n_rows, size=shape).astype(np.int32)
    max_vals = lengths[indices] - 2
    inside = rng.randint(0, np.maximum(max_vals - 1, 1))  # strictly in range
    symbols = (inside + offsets[indices]).astype(np.int32)
    if with_overflow:
        symbols[0, 0, 0, 0] = 60
        symbols[0, 2, 3, 3] = -13
    return symbols, indices, cdf, lengths, offsets


@pytest.mark.parametrize("with_overflow", [False, True])
def test_scalar_indexed_coder_byte_equality(ref_modules, with_overflow):
    """Reference scalar coder vs ours: byte-identical streams, cross-decode."""
    _, ref_coding = ref_modules
    from hific_tpu.entropy.coding import (
        decode_indexed_scalar,
        encode_indexed_scalar,
    )

    symbols, indices, cdf, lengths, offsets = _tables_and_symbols(with_overflow)

    ref_stream, _ = ref_coding.ans_index_encoder(
        symbols.copy(), indices, cdf.astype(np.uint64), lengths, offsets, 16)
    our_stream, _ = encode_indexed_scalar(symbols, indices, cdf, lengths,
                                          offsets, 16)
    np.testing.assert_array_equal(np.asarray(ref_stream, np.uint32),
                                  our_stream)

    # our decoder on the reference's bytes
    decoded = decode_indexed_scalar(np.asarray(ref_stream, np.uint32),
                                    indices, cdf, lengths, offsets, 16)
    np.testing.assert_array_equal(decoded, symbols)

    # reference decoder on our bytes
    ref_decoded = ref_coding.ans_index_decoder(
        our_stream, indices, cdf.astype(np.uint64), lengths, offsets, 16,
        coding_shape=symbols.shape[1:])
    np.testing.assert_array_equal(
        ref_decoded.reshape(symbols.shape).astype(np.int32), symbols)


def test_vectorized_coder_byte_equality_no_overflow(ref_modules):
    """Vectorized lane path: byte equality when no overflow escapes occur
    (the reference's masked-overflow path needs its autograd dep and is
    bug-compatible only for single-nibble payloads — see coding.py)."""
    _, ref_coding = ref_modules
    from hific_tpu.entropy.coding import decode_indexed, encode_indexed

    symbols, indices, cdf, lengths, offsets = _tables_and_symbols(False)

    ref_stream, ref_cs = ref_coding.vec_ans_index_encoder(
        symbols.copy(), indices, cdf.astype(np.uint64), lengths, offsets, 16,
        coding_shape=symbols.shape[1:])
    our_stream, our_cs = encode_indexed(symbols, indices, cdf, lengths,
                                        offsets, 16)
    np.testing.assert_array_equal(np.asarray(ref_stream, np.uint32),
                                  our_stream)

    decoded = decode_indexed(np.asarray(ref_stream, np.uint32), indices, cdf,
                             lengths, offsets, 16)
    np.testing.assert_array_equal(decoded, symbols)

    ref_decoded = ref_coding.vec_ans_index_decoder(
        our_stream, indices, cdf.astype(np.uint64), lengths, offsets, 16,
        coding_shape=tuple(our_cs))
    np.testing.assert_array_equal(np.asarray(ref_decoded, np.int32), symbols)


def test_vectorized_coder_byte_equality_single_nibble_overflow(ref_modules):
    """Vectorized lane path WITH overflow escapes, single-nibble payloads —
    the practical case on real images (hyperlatent escapes are tiny).

    The reference's multi-nibble path is buggy (its nibble-round counter
    resets every iteration, entropy_coding.py:399-410) and deliberately not
    replicated; for single-nibble payloads (|escape| <= 15 after the
    even/odd folding) both coders must produce byte-identical streams and
    cross-decode.
    """
    _, ref_coding = ref_modules
    from hific_tpu.entropy.coding import decode_indexed, encode_indexed

    symbols, indices, cdf, lengths, offsets = _tables_and_symbols(False)
    max_vals = (lengths[indices] - 2).astype(np.int32)

    # Escapes on scattered positions, all single-nibble:
    #   value == max_value (overflow code 0)
    #   value == max_value + k, k in [1..7]  (overflow 2k   <= 14)
    #   value == offset - k,    k in [1..8]  (overflow 2k-1 <= 15)
    rng = np.random.RandomState(11)
    flat_sym = symbols.reshape(-1)
    flat_max = (max_vals + offsets[indices]).reshape(-1)
    flat_min = offsets[indices].reshape(-1)
    n = flat_sym.size
    pos = rng.choice(n, size=max(4, n // 6), replace=False)
    third = len(pos) // 3
    flat_sym[pos[:third]] = flat_max[pos[:third]]                      # ==max
    hi = pos[third:2 * third]
    flat_sym[hi] = flat_max[hi] + rng.randint(1, 8, size=len(hi))       # +k
    lo = pos[2 * third:]
    flat_sym[lo] = flat_min[lo] - rng.randint(1, 9, size=len(lo))       # -k
    symbols = flat_sym.reshape(symbols.shape)

    ref_stream, ref_cs = ref_coding.vec_ans_index_encoder(
        symbols.copy(), indices, cdf.astype(np.uint64), lengths, offsets, 16,
        coding_shape=symbols.shape[1:])
    our_stream, our_cs = encode_indexed(symbols, indices, cdf, lengths,
                                        offsets, 16)
    np.testing.assert_array_equal(np.asarray(ref_stream, np.uint32),
                                  our_stream)

    # our decoder on the reference's bytes
    decoded = decode_indexed(np.asarray(ref_stream, np.uint32), indices, cdf,
                             lengths, offsets, 16)
    np.testing.assert_array_equal(decoded, symbols)

    # reference decoder on our bytes
    ref_decoded = ref_coding.vec_ans_index_decoder(
        our_stream, indices, cdf.astype(np.uint64), lengths, offsets, 16,
        coding_shape=tuple(our_cs))
    np.testing.assert_array_equal(np.asarray(ref_decoded, np.int32), symbols)

    # numpy and native C++ paths agree byte-for-byte on the same input
    # (encode_indexed dispatches to the C++ kernel when built)
    np_stream, _ = encode_indexed(symbols, indices, cdf, lengths, offsets,
                                  16, use_native=False)
    np.testing.assert_array_equal(np_stream, our_stream)


def test_scalar_coder_wide_escape_envelope(ref_modules):
    """Pins the WIDE-escape (multi-nibble) compatibility envelope exactly
    (VERDICT r2 missing #5): in the SCALAR path, arbitrarily wide escapes
    (here up to 2^20) are byte-identical between the two frameworks and
    cross-decode both ways — the reference's scalar coder
    (entropy_coding.py:479-558) codes multi-nibble payloads correctly;
    only its VECTORIZED path is buggy (see test below)."""
    _, ref_coding = ref_modules
    from hific_tpu.entropy.coding import (
        decode_indexed_scalar,
        encode_indexed_scalar,
    )

    symbols, indices, cdf, lengths, offsets = _tables_and_symbols(False)
    flat = symbols.reshape(-1)
    # escapes needing 1..6 nibbles, both signs
    wide = np.array([17, -40, 300, -1000, 123456, -(1 << 20)], np.int32)
    flat[:: max(1, flat.size // len(wide))][: len(wide)] = wide

    ref_stream, _ = ref_coding.ans_index_encoder(
        symbols.copy(), indices, cdf.astype(np.uint64), lengths, offsets, 16)
    our_stream, _ = encode_indexed_scalar(symbols, indices, cdf, lengths,
                                          offsets, 16)
    np.testing.assert_array_equal(np.asarray(ref_stream, np.uint32),
                                  our_stream)

    decoded = decode_indexed_scalar(np.asarray(ref_stream, np.uint32),
                                    indices, cdf, lengths, offsets, 16)
    np.testing.assert_array_equal(decoded, symbols)

    ref_decoded = ref_coding.ans_index_decoder(
        our_stream, indices, cdf.astype(np.uint64), lengths, offsets, 16,
        coding_shape=symbols.shape[1:])
    np.testing.assert_array_equal(
        ref_decoded.reshape(symbols.shape).astype(np.int32), symbols)


def test_vectorized_wide_escape_ours_roundtrips_reference_does_not(
        ref_modules):
    """The other half of the envelope: VECTORIZED streams containing a
    multi-nibble escape are NOT reference-interoperable — because the
    reference's own vectorized coder corrupts them (its nibble-round
    counter resets every masked round, entropy_coding.py:399-410/641-651).
    Oracle proof that our deviation is a bug fix, not an incompatibility:
    the reference fails to round-trip ITS OWN vectorized stream on this
    input, while ours round-trips exactly."""
    _, ref_coding = ref_modules
    from hific_tpu.entropy.coding import decode_indexed, encode_indexed

    symbols, indices, cdf, lengths, offsets = _tables_and_symbols(False)
    symbols[0, 0, 0, 0] = 300     # overflow ~ 2*(300-max) >> 15: multi-nibble
    symbols[0, 3, 2, 4] = -900

    our_stream, our_cs = encode_indexed(symbols, indices, cdf, lengths,
                                        offsets, 16)
    decoded = decode_indexed(our_stream, indices, cdf, lengths, offsets, 16)
    np.testing.assert_array_equal(decoded, symbols)   # ours: exact

    ref_stream, ref_cs = ref_coding.vec_ans_index_encoder(
        symbols.copy(), indices, cdf.astype(np.uint64), lengths, offsets, 16,
        coding_shape=symbols.shape[1:])
    ref_self = np.asarray(ref_coding.vec_ans_index_decoder(
        np.asarray(ref_stream), indices, cdf.astype(np.uint64), lengths,
        offsets, 16, coding_shape=tuple(ref_cs)), np.int32)
    assert not np.array_equal(ref_self, symbols), (
        "reference vectorized multi-nibble round-trip unexpectedly exact — "
        "re-examine the envelope: wide vectorized escapes may now be "
        "reference-compatible")
