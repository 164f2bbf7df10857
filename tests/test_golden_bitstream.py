"""Golden-bitstream regression: the coder's byte output for fixed inputs is
part of the format contract. If this test fails, the bitstream format
changed and old .hfc files can no longer be decoded."""

import hashlib
import os

import numpy as np

from hific_tpu.entropy.coding import (
    decode_indexed,
    encode_indexed,
)
from hific_tpu.ops.maths import pmf_to_quantized_cdf

GOLDEN_SHA = "golden.sha256"
HERE = os.path.dirname(__file__)


def _fixed_stream():
    """Deterministic tables + symbols -> encoded words."""
    rng = np.random.RandomState(1234)
    n_rows = 5
    lengths = np.array([6, 8, 10, 7, 9], np.int32)  # cdf_length
    max_len = lengths.max()
    cdf = np.zeros((n_rows, max_len), np.uint32)
    offsets = np.array([-3, -2, 0, -5, 1], np.int32)
    for r in range(n_rows):
        support = lengths[r] - 2
        pmf = rng.rand(support) + 0.01
        pmf = pmf / pmf.sum() * 0.99
        pmf = np.concatenate([pmf, [0.01]])
        cdf[r, : support + 2] = pmf_to_quantized_cdf(pmf, 16)
    shape = (1, 5, 6, 6)
    indices = rng.randint(0, n_rows, size=shape).astype(np.int32)
    symbols = (rng.randint(0, 5, size=shape) + offsets[indices]).astype(np.int32)
    symbols[0, 0, 0, 0] = 57   # overflow escapes included in the contract
    symbols[0, 1, 2, 3] = -41
    encoded, _ = encode_indexed(symbols, indices, cdf, lengths, offsets, 16)
    return encoded, symbols, indices, cdf, lengths, offsets


def test_bitstream_is_frozen():
    encoded, symbols, indices, cdf, lengths, offsets = _fixed_stream()
    digest = hashlib.sha256(encoded.tobytes()).hexdigest()

    golden_path = os.path.join(HERE, GOLDEN_SHA)
    if not os.path.exists(golden_path):  # first run writes the contract
        with open(golden_path, "w") as f:
            f.write(digest + "\n")
    with open(golden_path) as f:
        golden = f.read().strip()
    assert digest == golden, (
        "bitstream format changed! Old .hfc files are now undecodable. "
        "If intentional, delete tests/golden.sha256 and bump the format.")

    decoded = decode_indexed(encoded, indices, cdf, lengths, offsets, 16)
    np.testing.assert_array_equal(decoded, symbols)
