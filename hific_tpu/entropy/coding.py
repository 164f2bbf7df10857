"""Indexed rANS coding with unbounded-overflow escape codes (host-side).

Codes integer symbol tensors against per-element CDF rows selected by an
`indices` tensor (the TF-compression "unbounded index range coding" scheme;
behavioral spec from reference src/compression/entropy_coding.py). Values
inside a row's tracked range [offset, offset + m - 2) are ANS-coded with the
row CDF; values outside emit the row's overflow code followed by a
variable-length sequence of `OVERFLOW_WIDTH`-bit nibbles.

Two paths:
- vectorized: one rANS lane per channel, looping over spatial positions
  (B=1), or one lane per (C,H,W) element looping over batch (B>1) —
  lane layout identical to the reference so bitstreams interoperate.
- scalar: single-lane, fully serial; smallest bitstream, used for
  cross-checks and the block_encode mode.

Engineering differences from the reference (same bitstream where it
matters):
- Symbol lookup on decode is O(1) via precomputed inverse tables
  (cum_freq -> symbol, 2^precision entries per row) instead of per-lane
  binary searches inside the decode loop.
- The encoder runs the position loop BACKWARD pushing directly into the
  rANS state instead of buffering an instruction list and flushing it in
  reverse — same LIFO bit order, no buffer.
- Multi-nibble overflow payloads are coded correctly (nibble j shifted by
  j*OVERFLOW_WIDTH). The reference's vectorized path has a counter-reset
  bug (entropy_coding.py:399-410 / 641-651) that corrupts any overflow
  needing >1 nibble; for the single-nibble overflows that occur in
  practice the two formats are bit-identical.

Reference-compatibility envelope (pinned by tests/test_reference_interop.py):
- scalar streams: ALWAYS interoperable, any escape width (the reference's
  scalar coder at entropy_coding.py:479-558 is correct; byte-equality +
  cross-decode tested up to 2^20 escapes).
- vectorized streams: interoperable iff every escape payload fits one
  nibble (|folded overflow| <= 15) — the practical case on real images.
  Wider vectorized escapes round-trip under OUR coder but not under the
  reference's own (oracle-proven: its self-round-trip corrupts them).
"""

from concurrent.futures import ThreadPoolExecutor
from typing import Tuple

import numpy as np

from hific_tpu.entropy import ans

OVERFLOW_WIDTH = 4
MAX_OVERFLOW = (1 << OVERFLOW_WIDTH) - 1


def build_inverse_table(cdf: np.ndarray, cdf_length: np.ndarray,
                        precision: int) -> np.ndarray:
    """Map cumulative frequency -> symbol for each CDF row.

    Returns int32 [n_rows, 2**precision]; row r maps cf to the s with
    cdf[r, s] <= cf < cdf[r, s+1]. Decode becomes a gather.
    """
    n_rows, _ = cdf.shape
    size = 1 << precision
    inv = np.zeros((n_rows, size), dtype=np.int32)
    for r in range(n_rows):
        row = cdf[r, : cdf_length[r]].astype(np.int64)
        # np.diff(row) are the frequencies; repeat each symbol freq times.
        freqs = np.diff(row)
        inv[r] = np.repeat(np.arange(len(freqs), dtype=np.int32), freqs)
    return inv


def _nibble_widths(overflow: np.ndarray) -> np.ndarray:
    """Number of OVERFLOW_WIDTH-bit nibbles needed per value (0 for 0)."""
    overflow = overflow.astype(np.int64)
    widths = np.zeros(overflow.shape, dtype=np.int64)
    shifted = overflow.copy()
    while np.any(shifted != 0):
        widths += shifted != 0
        shifted >>= OVERFLOW_WIDTH
    return widths


def _prepare(symbols, indices, cdf, cdf_length, cdf_offset):
    """Shared symbol -> (in-range value, overflow payload) mapping."""
    symbols = symbols.astype(np.int64)
    indices = indices.astype(np.int64)
    assert symbols.shape == indices.shape
    assert indices.min() >= 0 and indices.max() < cdf.shape[0], "invalid index"

    max_value = cdf_length[indices].astype(np.int64) - 2
    values = symbols - cdf_offset[indices].astype(np.int64)

    overflow = np.zeros_like(values)
    lower = values < 0
    upper = values >= max_value
    overflow = np.where(lower, -2 * values - 1, overflow)
    overflow = np.where(upper, 2 * (values - max_value), overflow)
    values = np.where(lower | upper, max_value, values)
    return values, overflow, max_value


def _lane_layout(x: np.ndarray) -> np.ndarray:
    """(1,C,H,W) -> (H*W, C): loop over spatial positions, lanes = channels
    (the reference's PATCH_SIZE=(1,1) decomposition)."""
    _, c, h, w = x.shape
    return x[0].transpose(1, 2, 0).reshape(h * w, c)


def _lane_unlayout(flat: np.ndarray, shape) -> np.ndarray:
    _, c, h, w = shape
    return flat.reshape(h, w, c).transpose(2, 0, 1)[None]


def _gather_start_freq(cdf_rows, values):
    """cdf_rows: (..., L) uint; values: (...) int -> (start, freq) uint64."""
    lower = np.take_along_axis(cdf_rows, values[..., None], axis=-1)[..., 0]
    upper = np.take_along_axis(cdf_rows, values[..., None] + 1, axis=-1)[..., 0]
    return lower.astype(np.uint64), (upper - lower).astype(np.uint64)


def _push_masked(msg, starts, freqs, precision, mask):
    """rANS push restricted to lanes where mask is True."""
    sub = ans.Message(msg.head[mask], stack=msg.stack)
    ans.rans_push(sub, starts, freqs, precision)
    head = msg.head.copy()
    head[mask] = sub.head
    msg.head = head
    msg.stack = sub.stack


def _pop_masked(msg, precision, mask):
    """rANS pop (identity CDF: symbol == cum_freq, freq 1) on masked lanes."""
    sub = ans.Message(msg.head[mask], stack=msg.stack, cursor=msg.cursor)
    cf, complete = ans.rans_pop(sub, precision)
    complete(cf, np.ones_like(cf))
    head = msg.head.copy()
    head[mask] = sub.head
    msg.head = head
    msg.stack = sub.stack
    msg.cursor = sub.cursor
    return cf.astype(np.int64)


def _encode_overflow_position(msg, overflow_i, widths_i, of_mask):
    """Push one position's overflow payload (reverse of decode order).

    Decode order: width marker round(s), then nibble rounds j=0..max_w-1,
    every round over ALL overflow lanes of this position (lanes whose
    payload is exhausted re-push their stale value, matching the reference
    lane protocol). Pushed here in reverse: nibbles high->low, then markers
    last->first.
    """
    ow = np.uint64(OVERFLOW_WIDTH)
    of_overflow = overflow_i[of_mask].astype(np.uint64)
    of_widths = widths_i[of_mask]

    # Width markers, generation order: m_k = min(remaining, 15) until all
    # lanes are done and no round emitted a 15 (decode's continue signal).
    rem = of_widths.copy()
    marker_rounds = []
    while True:
        m = np.minimum(rem, MAX_OVERFLOW)
        marker_rounds.append(m.astype(np.uint64))
        rem = rem - m
        if not np.any(rem > 0) and not np.any(m >= MAX_OVERFLOW):
            break

    # Nibble rounds, generation order. `val` carries the stale value for
    # exhausted lanes (initially the last marker each lane popped).
    val = marker_rounds[-1].copy()
    nibble_rounds = []
    for j in range(int(of_widths.max()) if of_widths.size else 0):
        nib = (of_overflow >> (ow * np.uint64(j))) & np.uint64(MAX_OVERFLOW)
        val = np.where(of_widths > j, nib, val)
        nibble_rounds.append(val.copy())

    for val_j in reversed(marker_rounds + nibble_rounds):
        _push_masked(msg, val_j, np.ones_like(val_j, np.uint64),
                     OVERFLOW_WIDTH, of_mask)


def _encode_layout(sym_l, idx_l, cdf, cdf_length, cdf_offset, precision,
                   use_native: bool) -> np.ndarray:
    """Encode laid-out (n_pos, n_lanes) symbols/indices to one uint32 stream.

    Shared core of `encode_indexed` and the lane-sharded variant; the
    bitstream depends only on the laid-out arrays, so a contiguous lane
    subset encodes to exactly the stream an independent coder would emit.
    """
    if use_native:
        from hific_tpu.entropy import native

        if native.available():
            return native.encode_lanes(sym_l.astype(np.int32),
                                       idx_l.astype(np.int32), cdf,
                                       np.asarray(cdf_length, np.int32),
                                       np.asarray(cdf_offset, np.int32),
                                       precision)
    values_l, overflow_l, max_value_l = _prepare(sym_l, idx_l, cdf,
                                                 cdf_length, cdf_offset)
    indices_l = idx_l.astype(np.int64)

    # Fully vectorized start/freq for the main symbols.
    cdf_rows = cdf[indices_l]                    # (P, lanes, L)
    starts, freqs = _gather_start_freq(cdf_rows, values_l)
    of_masks = values_l == max_value_l           # lanes emitting overflow
    widths = _nibble_widths(overflow_l)

    msg = ans.empty_message(values_l.shape[1:])
    # LIFO: walk positions backward, pushing each position's instructions in
    # reverse (overflow payload first, then the symbol).
    for i in range(values_l.shape[0] - 1, -1, -1):
        of_mask = of_masks[i]
        if np.any(of_mask):
            _encode_overflow_position(msg, overflow_l[i], widths[i], of_mask)
        ans.rans_push(msg, starts[i], freqs[i], precision)

    return ans.flatten_message(msg)


def _layout(symbols, indices):
    """(N,C,H,W) -> laid-out (n_pos, n_lanes) pair + coding_shape."""
    n, c = symbols.shape[:2]
    if n == 1:
        return (_lane_layout(symbols), _lane_layout(indices), (c, 1, 1))
    return (symbols.reshape(n, -1), indices.reshape(n, -1), symbols.shape[1:])


def encode_indexed(symbols, indices, cdf, cdf_length, cdf_offset, precision,
                   use_native: bool = True) -> Tuple[np.ndarray, tuple]:
    """Vectorized encode of (N,C,H,W) int symbols. Returns (uint32 stream,
    coding_shape). Dispatches to the C++ kernel when built (identical
    bitstream); set use_native=False or HIFIC_TPU_NATIVE=0 for pure numpy."""
    symbols = np.asarray(symbols)
    indices = np.asarray(indices)
    cdf = np.asarray(cdf, dtype=np.uint32)
    sym_l, idx_l, coding_shape = _layout(symbols, indices)
    return (_encode_layout(sym_l, idx_l, cdf, cdf_length, cdf_offset,
                           precision, use_native), coding_shape)


def _decode_layout(encoded, idx_l, cdf, cdf_length, cdf_offset, precision,
                   inverse_table, use_native: bool) -> np.ndarray:
    """Decode one stream against laid-out (n_pos, n_lanes) indices."""
    if use_native:
        from hific_tpu.entropy import native

        if native.available():
            return native.decode_lanes(
                np.asarray(encoded, np.uint32), idx_l.astype(np.int32), cdf,
                np.asarray(cdf_length, np.int32),
                np.asarray(cdf_offset, np.int32),
                np.asarray(inverse_table, np.int32), precision)
    indices_l = idx_l.astype(np.int64)
    max_values = cdf_length[indices_l].astype(np.int64) - 2
    offsets = cdf_offset[indices_l].astype(np.int64)
    msg = ans.unflatten_message(encoded, (indices_l.shape[1],))

    decoded = np.empty_like(indices_l)
    ow = OVERFLOW_WIDTH
    for i in range(indices_l.shape[0]):
        idx_i = indices_l[i]
        cf, complete = ans.rans_pop(msg, precision)
        value = inverse_table[idx_i, cf.astype(np.int64)].astype(np.int64)
        starts, freqs = _gather_start_freq(cdf[idx_i], value)
        complete(starts, freqs)

        max_value_i = max_values[i]
        of_mask = value == max_value_i
        if np.any(of_mask):
            val = _pop_masked(msg, ow, of_mask)
            widths = val.copy()
            while np.any(val == MAX_OVERFLOW):
                val = _pop_masked(msg, ow, of_mask)
                widths = widths + val
            overflow = np.zeros_like(val)
            max_w = int(widths.max())
            for j in range(max_w):
                val = _pop_masked(msg, ow, of_mask)
                overflow = np.where(widths > j,
                                    overflow | (val << (j * ow)), overflow)
            # Map non-negative payload back to signed value.
            of_value = overflow >> 1
            of_value = np.where(overflow & 1, -of_value - 1,
                                of_value + max_value_i[of_mask])
            value[of_mask] = of_value
        decoded[i] = value + offsets[i]
    return decoded


def decode_indexed(encoded, indices, cdf, cdf_length, cdf_offset, precision,
                   inverse_table=None, use_native: bool = True) -> np.ndarray:
    """Vectorized decode; `indices` must match the encoder's. Returns int32
    symbols shaped like `indices`."""
    indices = np.asarray(indices)
    cdf = np.asarray(cdf, dtype=np.uint32)
    if inverse_table is None:
        inverse_table = build_inverse_table(cdf, cdf_length, precision)

    n = indices.shape[0]
    idx_l = _lane_layout(indices) if n == 1 else indices.reshape(n, -1)
    decoded = _decode_layout(encoded, idx_l, cdf, cdf_length, cdf_offset,
                             precision, inverse_table, use_native)
    if n == 1:
        return _lane_unlayout(decoded, indices.shape).astype(np.int32)
    return decoded.reshape(indices.shape).astype(np.int32)


# --------------------------------------------------------------------------
# Lane-sharded multithreaded coding (container v2 payloads).
#
# The rANS lanes (channels for B=1) are independent except for the shared
# spill stack, so splitting them into K contiguous groups — each coded to
# its own stream — parallelizes encode AND decode across host threads (the
# C++ kernel runs outside the GIL) with ~zero size overhead: the per-lane
# head words dominate the flush either way. Payload layout:
#
#   uint32 K | uint32 len_0..len_{K-1} | stream_0 | ... | stream_{K-1}
#
# Each stream_k is byte-identical to what `encode_indexed` would emit for
# that lane subset alone (tested), so shard boundaries are seekable entry
# points — a decoder can also decode any channel group without the rest.
# --------------------------------------------------------------------------


def _lane_splits(n_lanes: int, shards: int):
    # Exact integer arithmetic: these bounds are part of the persisted v2
    # format (re-derived at decode), so they must be bit-identical across
    # numpy versions/platforms — no float intermediates.
    shards = max(1, min(int(shards), n_lanes))
    bounds = [k * n_lanes // shards for k in range(shards + 1)]
    return [(bounds[k], bounds[k + 1]) for k in range(shards)]


def encode_indexed_sharded(symbols, indices, cdf, cdf_length, cdf_offset,
                           precision, shards: int, use_native: bool = True
                           ) -> Tuple[np.ndarray, tuple]:
    """Encode with lanes sharded into `shards` independent streams, coded in
    parallel host threads. Returns (self-describing uint32 payload,
    coding_shape). Not bit-compatible with the reference coder — opt-in via
    the container v2 flag."""
    symbols = np.asarray(symbols)
    indices = np.asarray(indices)
    cdf = np.asarray(cdf, dtype=np.uint32)
    sym_l, idx_l, coding_shape = _layout(symbols, indices)
    splits = _lane_splits(sym_l.shape[1], shards)

    def _one(span):
        lo, hi = span
        return _encode_layout(np.ascontiguousarray(sym_l[:, lo:hi]),
                              np.ascontiguousarray(idx_l[:, lo:hi]),
                              cdf, cdf_length, cdf_offset, precision,
                              use_native)

    if len(splits) == 1:
        streams = [_one(splits[0])]
    else:
        with ThreadPoolExecutor(max_workers=len(splits)) as pool:
            streams = list(pool.map(_one, splits))
    header = np.array([len(streams)] + [len(s) for s in streams], np.uint32)
    return np.concatenate([header] + streams), coding_shape


def decode_indexed_sharded(encoded, indices, cdf, cdf_length, cdf_offset,
                           precision, inverse_table=None,
                           use_native: bool = True) -> np.ndarray:
    """Decode a sharded payload (shard count is read from the payload; the
    lane split is re-derived from it, so any thread count can decode any
    shard count)."""
    indices = np.asarray(indices)
    cdf = np.asarray(cdf, dtype=np.uint32)
    if inverse_table is None:
        inverse_table = build_inverse_table(cdf, cdf_length, precision)

    encoded = np.asarray(encoded, np.uint32)
    if encoded.size < 1:
        raise ValueError("corrupt sharded payload: empty")
    k = int(encoded[0])

    n = indices.shape[0]
    idx_l = _lane_layout(indices) if n == 1 else indices.reshape(n, -1)
    n_lanes = idx_l.shape[1]
    if not 1 <= k <= n_lanes:
        raise ValueError(
            f"corrupt sharded payload: shard count {k} not in [1, {n_lanes}]")
    if encoded.size < 1 + k:
        raise ValueError("corrupt sharded payload: truncated shard-length header")
    lens = encoded[1 : 1 + k].astype(np.int64)
    if 1 + k + int(lens.sum()) != encoded.size:
        raise ValueError(
            f"corrupt sharded payload: header promises {1 + k + int(lens.sum())}"
            f" words, payload has {encoded.size}")
    offs = np.concatenate([[1 + k], 1 + k + np.cumsum(lens)]).astype(np.int64)
    splits = _lane_splits(n_lanes, k)

    def _one(args):
        (lo, hi), stream = args
        return _decode_layout(stream, np.ascontiguousarray(idx_l[:, lo:hi]),
                              cdf, cdf_length, cdf_offset, precision,
                              inverse_table, use_native)

    jobs = [(splits[i], encoded[offs[i]:offs[i + 1]]) for i in range(k)]
    if k == 1:
        parts = [_one(jobs[0])]
    else:
        with ThreadPoolExecutor(max_workers=k) as pool:
            parts = list(pool.map(_one, jobs))
    decoded = np.concatenate(parts, axis=1)
    if n == 1:
        return _lane_unlayout(decoded, indices.shape).astype(np.int32)
    return decoded.reshape(indices.shape).astype(np.int32)


# --------------------------------------------------------------------------
# Scalar (single-lane) path: smallest bitstream, serial.
# --------------------------------------------------------------------------


def encode_indexed_scalar(symbols, indices, cdf, cdf_length, cdf_offset,
                          precision, use_native: bool = True
                          ) -> Tuple[np.ndarray, tuple]:
    symbols = np.asarray(symbols)
    coding_shape = symbols.shape[1:]

    if use_native:
        from hific_tpu.entropy import native

        if native.available():
            # Single-lane == scalar: identical push sequence and layout.
            encoded = native.encode_lanes(
                symbols.reshape(-1, 1).astype(np.int32),
                np.asarray(indices).reshape(-1, 1).astype(np.int32),
                np.asarray(cdf, np.uint32), np.asarray(cdf_length, np.int32),
                np.asarray(cdf_offset, np.int32), precision)
            return encoded, coding_shape
    values, overflow, max_value = _prepare(symbols, indices, cdf, cdf_length,
                                           cdf_offset)
    values_f = values.reshape(-1)
    overflow_f = overflow.reshape(-1)
    indices_f = np.asarray(indices).reshape(-1).astype(np.int64)
    max_value_f = max_value.reshape(-1)
    widths_f = _nibble_widths(overflow_f)

    msg = ans.empty_message(())
    one = np.uint64(1)
    for i in range(len(values_f) - 1, -1, -1):
        v = int(values_f[i])
        if v == max_value_f[i]:  # overflow payload, pushed in reverse
            w = int(widths_f[i])
            ov = int(overflow_f[i])
            for j in range(w - 1, -1, -1):
                nib = (ov >> (j * OVERFLOW_WIDTH)) & MAX_OVERFLOW
                ans.rans_push(msg, np.uint64(nib), one, OVERFLOW_WIDTH)
            rem = w
            markers = []
            while rem >= MAX_OVERFLOW:
                markers.append(MAX_OVERFLOW)
                rem -= MAX_OVERFLOW
            markers.append(rem)
            for m in reversed(markers):
                ans.rans_push(msg, np.uint64(m), one, OVERFLOW_WIDTH)
        row = cdf[indices_f[i]]
        ans.rans_push(msg, np.uint64(row[v]), np.uint64(row[v + 1] - row[v]),
                      precision)
    return ans.flatten_message(msg), coding_shape


def decode_indexed_scalar(encoded, indices, cdf, cdf_length, cdf_offset,
                          precision, inverse_table=None,
                          use_native: bool = True) -> np.ndarray:
    indices_f = np.asarray(indices).reshape(-1).astype(np.int64)
    cdf = np.asarray(cdf, dtype=np.uint32)
    if inverse_table is None:
        inverse_table = build_inverse_table(cdf, cdf_length, precision)

    if use_native:
        from hific_tpu.entropy import native

        if native.available():
            decoded = native.decode_lanes(
                np.asarray(encoded, np.uint32),
                indices_f.reshape(-1, 1).astype(np.int32), cdf,
                np.asarray(cdf_length, np.int32),
                np.asarray(cdf_offset, np.int32),
                np.asarray(inverse_table, np.int32), precision)
            return decoded.reshape(np.asarray(indices).shape).astype(np.int32)
    msg = ans.unflatten_message_scalar(encoded)
    decoded = np.empty(len(indices_f), dtype=np.int64)
    one = np.uint64(1)
    for i in range(len(indices_f)):
        idx = indices_f[i]
        cf, complete = ans.rans_pop(msg, precision)
        value = int(inverse_table[idx, int(cf)])
        row = cdf[idx]
        complete(np.uint64(row[value]), np.uint64(row[value + 1] - row[value]))
        max_value = int(cdf_length[idx]) - 2
        if value == max_value:
            cf, complete = ans.rans_pop(msg, OVERFLOW_WIDTH)
            complete(cf, one)
            val = int(cf)
            widths = val
            while val == MAX_OVERFLOW:
                cf, complete = ans.rans_pop(msg, OVERFLOW_WIDTH)
                complete(cf, one)
                val = int(cf)
                widths += val
            ov = 0
            for j in range(widths):
                cf, complete = ans.rans_pop(msg, OVERFLOW_WIDTH)
                complete(cf, one)
                ov |= int(cf) << (j * OVERFLOW_WIDTH)
            value = ov >> 1
            if ov & 1:
                value = -value - 1
            else:
                value += max_value
        decoded[i] = value + cdf_offset[idx]
    return decoded.reshape(np.asarray(indices).shape).astype(np.int32)
