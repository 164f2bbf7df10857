"""On-device rANS decode: the 64-bit lane-vectorized stream, decoded on TPU.

Decodes the SAME v1 bitstream as `entropy/coding.py` / the C++ kernel (and
therefore the reference coder) entirely inside one XLA program, as a
`lax.scan` over spatial positions with one rANS lane per channel. The
uint64 lane heads are emulated as uint32 pairs — rANS *decode* needs only
multiply / shift / add (division exists only on the encode side), and all
frequencies fit in 16 bits (precision 16), so the emulation is a handful
of VPU ops per position.

Why: on relayed/tunneled transports every device<->host transfer costs
~30 ms flat + ~21 ms/MB (PERF.md). Host-side rANS decode of the latents
forces THREE of them per image (scale-index download, symbol upload, and a
separate stats dispatch); decoding on device collapses decompression to
ONE tiny upload (hyperlatent symbols + the coded stream, ~0.2 MB/MP) +
ONE dispatch + the final uint8 image download. The ~35 ms the 1 MP scan
costs on a v5e chip replaces ~100 ms of wire time — and in pipelined batch
decoding the scan overlaps other images' transfers entirely.

Semantics mirror `coding.py:decode_indexed` / `csrc/rans.cc:Decoder`
(reference src/compression/entropy_coding.py:561-673 vectorized decoder):
per position every lane pops one symbol against its indexed CDF row;
lanes that pop the overflow code then pop width-marker and nibble rounds
(4-bit identity CDF) in which all of the position's overflow lanes
participate; lanes whose head falls below 2^31 refill one uint32 tail
word, in lane order, from a shared cursor.

Limit: overflow payloads are accumulated in uint32 (symbols within
+-2^30 of the tracked range). Real models emit at most a few-nibble
escapes; the host path remains available for adversarial inputs.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_M16 = np.uint32(0xFFFF)
_RANS_L_LO = np.uint32(0x80000000)  # heads live in [2^31, 2^63)
_OVERFLOW_WIDTH = 4
_MAX_OVERFLOW = np.uint32((1 << _OVERFLOW_WIDTH) - 1)


class DeviceTables(NamedTuple):
    """Decode tables laid out for O(1) on-device gathers (host numpy; the
    codec ships them to the device once per checkpoint)."""
    t_pair: np.ndarray  # int32 [rows * 2^precision, 2]:
    #   [:, 0] = (start << 16 | freq) bits, [:, 1] = symbol value.
    #   Interleaved so each pop is ONE paired gather (measured ~12% faster
    #   than two separate table gathers on v5e).
    maxv: np.ndarray    # int32  [rows]: overflow code (cdf_length - 2)
    offs: np.ndarray    # int32  [rows]: cdf_offset


def build_device_tables(cdf, cdf_length, cdf_offset, inverse) -> DeviceTables:
    """Precompute (start, freq, value) lookups indexed by [row, cum_freq].

    `inverse` is the O(1) decode table from coding.build_inverse_table;
    start/freq are gathered from the CDF rows along it, so one device
    gather per pop replaces the per-symbol searchsorted of the reference
    (entropy_coding.py:95-105)."""
    cdf = np.asarray(cdf, np.uint32)
    inverse = np.asarray(inverse, np.int64)
    start = np.take_along_axis(cdf, inverse, axis=1).astype(np.uint32)
    upper = np.take_along_axis(cdf, inverse + 1, axis=1).astype(np.uint32)
    freq = upper - start
    assert freq.max() <= 0xFFFF and start.max() <= 0xFFFF
    t_sf = ((start << np.uint32(16)) | freq).view(np.int32)
    t_pair = np.stack([t_sf.reshape(-1), inverse.astype(np.int32).reshape(-1)],
                      axis=-1)
    return DeviceTables(
        t_pair=np.ascontiguousarray(t_pair),
        maxv=(np.asarray(cdf_length, np.int32) - 2),
        offs=np.asarray(cdf_offset, np.int32),
    )


def _renorm(hi, lo, cursor, tail, active):
    """Refill `active` lanes whose head dropped below 2^31 with one tail
    word each, in lane order (matches ans.rans_pop's completion)."""
    pred = active & (hi == 0) & (lo < _RANS_L_LO)
    pred_u = pred.astype(jnp.uint32)
    k = jnp.cumsum(pred_u) - pred_u          # exclusive prefix: lane order
    # max(.., 0): with an empty tail the uint32 bound would wrap to 2^32-1,
    # disabling the clamp and gathering from a size-0 array.
    widx = jnp.minimum(cursor + k, jnp.uint32(max(tail.shape[0] - 1, 0)))
    word = tail[widx] if tail.shape[0] else jnp.zeros_like(widx)
    hi = jnp.where(pred, lo, hi)             # h = (h << 32) | word
    lo = jnp.where(pred, word, lo)
    return hi, lo, cursor + jnp.sum(pred_u)


def _pop_nibble(hi, lo, cursor, tail, mask):
    """4-bit identity-CDF pop on masked lanes: cf = h & 15; h >>= 4."""
    cf = lo & _MAX_OVERFLOW
    nhi = hi >> 4
    nlo = (lo >> 4) | (hi << 28)
    hi = jnp.where(mask, nhi, hi)
    lo = jnp.where(mask, nlo, lo)
    hi, lo, cursor = _renorm(hi, lo, cursor, tail, mask)
    return jnp.where(mask, cf, jnp.uint32(0)), hi, lo, cursor


def _decode_overflow(val, of, maxv_row, hi, lo, cursor, tail):
    """Width-marker rounds then nibble rounds, all of-lanes participating
    in every round (coding.py:_pop_masked protocol)."""
    v, hi, lo, cursor = _pop_nibble(hi, lo, cursor, tail, of)
    widths = v

    def marker_cond(s):
        v, *_ = s
        return jnp.any(v == _MAX_OVERFLOW)

    def marker_body(s):
        v, widths, hi, lo, cursor = s
        v, hi, lo, cursor = _pop_nibble(hi, lo, cursor, tail, of)
        return v, widths + v, hi, lo, cursor

    v, widths, hi, lo, cursor = jax.lax.while_loop(
        marker_cond, marker_body, (v, widths, hi, lo, cursor))

    max_w = jnp.max(jnp.where(of, widths, jnp.uint32(0)))

    def nib_cond(s):
        j, *_ = s
        return j < max_w

    def nib_body(s):
        j, ov, hi, lo, cursor = s
        v, hi, lo, cursor = _pop_nibble(hi, lo, cursor, tail, of)
        sh = jnp.minimum(j * jnp.uint32(_OVERFLOW_WIDTH), jnp.uint32(31))
        ov = jnp.where(of & (widths > j), ov | (v << sh), ov)
        return j + jnp.uint32(1), ov, hi, lo, cursor

    _, ov, hi, lo, cursor = jax.lax.while_loop(
        nib_cond, nib_body,
        (jnp.uint32(0), jnp.zeros_like(widths), hi, lo, cursor))

    # Non-negative payload back to signed symbol value (coding.py:292-296).
    half = (ov >> 1).astype(jnp.int32)
    of_val = jnp.where((ov & 1).astype(jnp.bool_), -half - 1,
                       half + maxv_row)
    return jnp.where(of, of_val, val), hi, lo, cursor


def decode_scan(stream, idx_l, t_pair, maxv, offs,
                precision: int = 16, unroll: int = 16):
    """Decode a flattened 64-bit-lane rANS stream on device.

    stream: (S,) uint32 — [head_hi(L) | head_lo(L) | tail...], possibly
        zero-padded past the true end (padding is never consumed).
    idx_l: (P, L) int32 — CDF-row index per position per lane, identical
        to the encoder's (lane layout: channels-as-lanes).
    Returns int32 (P, L) symbols, bit-exactly what the host decoder yields.
    """
    _, lanes = idx_l.shape
    if stream.shape[0] < 2 * lanes:
        raise ValueError(
            f"stream too short for {lanes} 64-bit lanes: need >= {2 * lanes} "
            f"uint32 head words, got {stream.shape[0]}")
    hi0 = stream[:lanes]
    lo0 = stream[lanes : 2 * lanes]
    tail = stream[2 * lanes :]
    mask16 = jnp.uint32((1 << precision) - 1)
    all_on = jnp.ones((lanes,), jnp.bool_)
    # Row-indexed lookups hoisted out of the scan as one big gather each
    # (the per-position gathers inside the loop are the scan's main cost).
    base_p = idx_l.astype(jnp.uint32) * jnp.uint32(1 << precision)
    maxv_p = maxv[idx_l]
    offs_p = offs[idx_l]

    def body(carry, xs):
        hi, lo, cursor = carry
        base_r, maxv_row, offs_row = xs
        cf = lo & mask16
        pr = t_pair[(base_r + cf).astype(jnp.int32)]   # ONE paired gather
        sf = pr[:, 0].astype(jnp.uint32)
        val = pr[:, 1]
        start = sf >> 16
        freq = sf & _M16

        # h = freq * (h >> precision) + (cf - start), in uint32 pairs.
        b_lo = (hi << 16) | (lo >> 16)
        b_hi = hi >> 16                       # < 2^16: h < 2^64
        m_ll = (b_lo & _M16) * freq
        m_lh = (b_lo >> 16) * freq
        m_h = b_hi * freq                     # fits: both factors < 2^16
        r_lo = m_ll + (m_lh << 16)
        c1 = (r_lo < m_ll).astype(jnp.uint32)
        r_hi = m_h + (m_lh >> 16) + c1
        d = cf - start                        # in [0, freq)
        lo2 = r_lo + d
        c2 = (lo2 < r_lo).astype(jnp.uint32)
        hi2 = r_hi + c2
        hi2, lo2, cursor = _renorm(hi2, lo2, cursor, tail, all_on)

        of = val == maxv_row
        val, hi2, lo2, cursor = jax.lax.cond(
            jnp.any(of),
            lambda a: _decode_overflow(a[0], of, maxv_row, a[1], a[2], a[3],
                                       tail),
            lambda a: a,
            (val, hi2, lo2, cursor))
        return (hi2, lo2, cursor), val + offs_row

    (_, _, _), out = jax.lax.scan(body, (hi0, lo0, jnp.uint32(0)),
                                  (base_p, maxv_p, offs_p), unroll=unroll)
    return out


# ---------------------------------------------------------------------- #
# Single-upload packing: hyperlatent symbols + coded stream in one buffer.
# ---------------------------------------------------------------------- #


def stream_bucket(n_words: int, bucket: int = 8192) -> int:
    """Pad stream length to a bucket so upload shapes (and compiles) are
    bounded across images."""
    return max(bucket, ((n_words + bucket - 1) // bucket) * bucket)


def pack_decode_input(z_sym: np.ndarray, stream: np.ndarray,
                      bucket: int = 8192) -> np.ndarray:
    """uint8 buffer = [z_sym int16 LE | stream uint32 LE, zero-padded]."""
    stream = np.asarray(stream, np.uint32)
    padded = np.zeros(stream_bucket(len(stream), bucket), np.uint32)
    padded[: len(stream)] = stream
    return np.concatenate([
        np.ascontiguousarray(z_sym.astype("<i2")).view(np.uint8).reshape(-1),
        padded.astype("<u4").view(np.uint8),
    ])


def unpack_decode_input(buf, z_shape):
    """Inverse of pack_decode_input, inside jit (bitcast, no copies)."""
    nz = int(np.prod(z_shape))
    z_sym = jax.lax.bitcast_convert_type(
        buf[: 2 * nz].reshape(nz, 2), jnp.int16).reshape(z_shape)
    stream = jax.lax.bitcast_convert_type(
        buf[2 * nz :].reshape(-1, 4), jnp.uint32)
    return z_sym, stream
