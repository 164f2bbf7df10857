"""On-device rANS encode: the 64-bit lane-vectorized stream, built on TPU.

Counterpart of device_decode.py — produces bit-for-bit the v1 stream of
`entropy/coding.py` / `csrc/rans.cc` (and the reference coder), so files
written this way decode on any path. With encode AND decode on device, the
entropy coder lives entirely where the symbols are: compression fetches
only head words + spilled stream words (~the .hfc payload) instead of the
~2 MB of raw symbols + indices the host coder needs.

Structure: unlike decode, every (start, freq) lookup depends only on the
symbols — which are known before coding starts — so ALL table gathers hoist
out of the scan as one vectorized pass (`prepare_encode`). The scan body
is pure uint32 arithmetic: the u64 heads are uint32 pairs, and the one
u64 / u16 division per push long-divides as three u32 divisions (the
divisor is a frequency < 2^16). Spilled words scatter into a carried
buffer in lane order; per-push-event spill counts are recorded so the
host can apply the same newest-chunk-first flatten as ans.flatten_message
(rans.cc:54-72).

Overflow escapes: the width-marker / nibble rounds the host generates
iteratively have closed forms —
    marker round k:  clamp(width - 15 k, 0, 15)
    nibble round j:  width > 0 ? nibble(min(j, width-1)) : last marker
— so the reversed LIFO push order (nibbles high->low, then markers
last->first; coding.py:_encode_overflow_position) is generated directly
inside bounded while_loops, gated by a lax.cond per affected position.

Capacity: the spill buffer and event-count buffer are statically sized;
the kernel reports its cursors so the caller can detect (statistically
impossible at sane bitrates, but checked) overflow and fall back to the
host coder.
"""

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_M16 = np.uint32(0xFFFF)
_RANS_L_HI = np.uint32(0)          # heads start at 2^31: hi=0, lo=2^31
_RANS_L_LO = np.uint32(0x80000000)
_OVERFLOW_WIDTH = 4
_MAX_OVERFLOW = np.uint32((1 << _OVERFLOW_WIDTH) - 1)
# Spill threshold for 4-bit identity pushes: h >= ((2^31 >> 4) << 32)
_X_MAX4_HI = np.uint32(1 << 27)


class EncodePlan(NamedTuple):
    """Per-position push data, precomputed vectorized (all [P, L], already
    REVERSED so the scan walks positions back-to-front)."""
    starts: jnp.ndarray    # uint32: CDF start of the pushed (clipped) value
    freqs: jnp.ndarray     # uint32: frequency of the pushed value
    of: jnp.ndarray        # bool: lane emits an overflow payload
    widths: jnp.ndarray    # uint32: payload nibble count
    payload: jnp.ndarray   # uint32: non-negative overflow payload
    max_w: jnp.ndarray     # uint32 [P]: max nibble rounds this position
    n_marker: jnp.ndarray  # uint32 [P]: marker rounds this position
    any_of: jnp.ndarray    # bool [P]


def prepare_encode(sym_l, idx_l, cdf, cdf_length, cdf_offset):
    """Vectorized symbol -> push-plan mapping (coding.py:_prepare + the
    overflow round closed forms), on device. sym_l/idx_l: (P, L) int32."""
    sym = sym_l.astype(jnp.int32)
    idx = idx_l.astype(jnp.int32)
    max_value = cdf_length[idx] - 2
    value = sym - cdf_offset[idx]
    lower = value < 0
    upper = value >= max_value
    of = lower | upper
    payload = jnp.where(lower, -2 * value - 1,
                        jnp.where(upper, 2 * (value - max_value), 0)
                        ).astype(jnp.uint32)
    value = jnp.where(of, max_value, value)

    # One gather pair per element, hoisted out of the scan entirely.
    max_len = cdf.shape[1]
    flat = cdf.reshape(-1)
    base = idx * max_len + value
    starts = flat[base].astype(jnp.uint32)
    freqs = (flat[base + 1] - flat[base]).astype(jnp.uint32)

    # ceil(log16(payload+1)) without loops: nibble width via bit length.
    bits = 32 - jax.lax.clz(payload)               # 0 for payload == 0
    widths = jnp.where(of & (payload > 0),
                       (bits + 3) // 4, jnp.uint32(0)).astype(jnp.uint32)
    w_of = jnp.where(of, widths, jnp.uint32(0))
    max_w = jnp.max(w_of, axis=1)
    n_marker = jnp.where(jnp.any(of, axis=1),
                         jnp.max(jnp.where(of, widths // 15, jnp.uint32(0)),
                                 axis=1) + 1,
                         jnp.uint32(0))
    plan = EncodePlan(
        starts=starts[::-1], freqs=freqs[::-1], of=of[::-1],
        widths=widths[::-1], payload=payload[::-1], max_w=max_w[::-1],
        n_marker=n_marker[::-1], any_of=jnp.any(of, axis=1)[::-1])
    return plan


def _push(hi, lo, starts, freqs, mask, precision, x_max_hi,
          spill, lens, s_cur, e_cur):
    """One push event on `mask` lanes: spill phase (lane order) then state
    update. Records the event's spill count; always advances e_cur."""
    sp = mask & (hi >= x_max_hi)
    sp_u = sp.astype(jnp.uint32)
    k = jnp.cumsum(sp_u) - sp_u
    pos = jnp.where(sp, s_cur + k, jnp.uint32(spill.shape[0]))
    spill = spill.at[pos].set(lo, mode="drop", unique_indices=True)
    n_sp = jnp.sum(sp_u)
    s_cur = s_cur + n_sp
    lens = jax.lax.dynamic_update_index_in_dim(
        lens, n_sp, e_cur.astype(jnp.int32), 0)
    e_cur = e_cur + 1
    # h >>= 32 on spilled lanes
    lo1 = jnp.where(sp, hi, lo)
    hi1 = jnp.where(sp, jnp.uint32(0), hi)

    if precision == _OVERFLOW_WIDTH:     # freq == 1: h = (h << 4) + start
        nhi = (hi1 << 4) | (lo1 >> 28)
        nlo = (lo1 << 4) + starts
    else:                                 # h = (h / f) << 16 + h % f + start
        f = freqs
        q_top = hi1 // f
        rem0 = hi1 - q_top * f
        a = (rem0 << 16) | (lo1 >> 16)
        q1 = a // f
        r1 = a - q1 * f
        b = (r1 << 16) | (lo1 & _M16)
        q2 = b // f
        r2 = b - q2 * f
        q_lo = (q1 << 16) | q2
        # (q << 16) + r2 + start; q_lo << 16 never carries into the added
        # low 16 bits (r2 + start < 2^17 only when start+r2 >= 2^16 rolls
        # into bit 16, which (q_lo << 16) leaves clear -- handle exactly:
        add = r2 + starts
        nlo = (q_lo << 16) + add
        carry = (nlo < (q_lo << 16)).astype(jnp.uint32)
        nhi = (q_top << 16) | (q_lo >> 16)
        nhi = nhi + carry
    hi2 = jnp.where(mask, nhi, hi1)
    lo2 = jnp.where(mask, nlo, lo1)
    return hi2, lo2, spill, lens, s_cur, e_cur


def _push_overflow(hi, lo, of, widths, payload, max_w, n_marker,
                   spill, lens, s_cur, e_cur):
    """Reversed LIFO overflow rounds: nibbles j = max_w-1..0, then markers
    k = n_marker-1..0 (matches coding.py:_encode_overflow_position)."""
    last_marker = jnp.clip(
        widths.astype(jnp.int32)
        - 15 * (n_marker.astype(jnp.int32) - 1), 0, 15).astype(jnp.uint32)

    def nib_val(j):
        jj = jnp.minimum(j, widths - 1)          # widths == 0 handled below
        nib = (payload >> (jj * jnp.uint32(4))) & _MAX_OVERFLOW
        return jnp.where(widths > 0, nib, last_marker)

    def nib_cond(s):
        return s[0] >= jnp.int32(0)

    def nib_body(s):
        j, hi, lo, spill, lens, s_cur, e_cur = s
        v = nib_val(j.astype(jnp.uint32))
        hi, lo, spill, lens, s_cur, e_cur = _push(
            hi, lo, v, None, of, _OVERFLOW_WIDTH, _X_MAX4_HI,
            spill, lens, s_cur, e_cur)
        return j - 1, hi, lo, spill, lens, s_cur, e_cur

    j0 = max_w.astype(jnp.int32) - 1
    _, hi, lo, spill, lens, s_cur, e_cur = jax.lax.while_loop(
        nib_cond, nib_body, (j0, hi, lo, spill, lens, s_cur, e_cur))

    def mk_cond(s):
        return s[0] >= jnp.int32(0)

    def mk_body(s):
        k, hi, lo, spill, lens, s_cur, e_cur = s
        m = jnp.clip(widths.astype(jnp.int32) - 15 * k, 0, 15).astype(
            jnp.uint32)
        hi, lo, spill, lens, s_cur, e_cur = _push(
            hi, lo, m, None, of, _OVERFLOW_WIDTH, _X_MAX4_HI,
            spill, lens, s_cur, e_cur)
        return k - 1, hi, lo, spill, lens, s_cur, e_cur

    k0 = n_marker.astype(jnp.int32) - 1
    _, hi, lo, spill, lens, s_cur, e_cur = jax.lax.while_loop(
        mk_cond, mk_body, (k0, hi, lo, spill, lens, s_cur, e_cur))
    return hi, lo, spill, lens, s_cur, e_cur


def default_caps(p: int, lanes: int,
                 bits_per_symbol: int = 2) -> Tuple[int, int]:
    """(spill_cap, lens_cap): `bits_per_symbol` of stream allowance and 4
    push events/position.

    The spill cap sizes the kernel's carried buffer AND the fetched result
    (the whole statically-shaped buffer crosses the wire): at a flat
    8 bits/symbol the 1 MP flagship fetch was ~1 MB of mostly zeros
    (~20 ms of pure wire waste per image on the tunneled transport,
    PERF.md round 5). The default 2 bits/symbol is ~5x the worst sane
    HiFiC LATENT operating point (~0.4 bit/symbol at 0.45 image bpp) —
    but callers must size each stream for ITS symbol statistics: the
    HYPERLATENT stream needs ~8 bits/symbol headroom because the learned
    factorized density is broad at random init / early training (measured
    5.3 bits/symbol on the bench's random-init model; round-5 lesson —
    an undersized z cap made every bench image silently pay the host-
    coder fallback, halving measured throughput). The z buffers are tiny
    in absolute terms (64x fewer positions than y), so the generous z cap
    costs ~60 KB of fetch, ~1 ms. The kernel reports true demand, so an
    exceeded cap still falls back to the host coder losslessly. The lens
    (event-count) buffer stays at 4 events/position: it is ~4% of the
    spill buffer's bytes, and adversarial distributions (tests use 30%
    escapes) legitimately push >1 event/position."""
    return p * lanes * bits_per_symbol // 32 + 4096, 4 * p + 64


Z_SPILL_BITS = 8  # hyperlatent-stream spill allowance (bits/symbol)



def encode_scan(sym_l, idx_l, cdf, cdf_length, cdf_offset,
                precision: int = 16, spill_cap: int = 0, lens_cap: int = 0,
                unroll: int = 8):
    """Encode laid-out (P, L) symbols on device.

    Returns (heads_hi, heads_lo, spill[spill_cap], lens[lens_cap],
    spill_count, event_count). The caller assembles the final stream with
    `assemble_stream` and MUST verify spill_count <= spill_cap and
    event_count <= lens_cap (fall back to the host coder otherwise).
    """
    p, lanes = sym_l.shape
    d_spill, d_lens = default_caps(p, lanes)
    spill_cap = spill_cap or d_spill
    lens_cap = lens_cap or d_lens
    plan = prepare_encode(sym_l, idx_l, cdf, cdf_length, cdf_offset)
    x_max16_hi_all = plan.freqs << (31 - precision)   # f << 15 (< 2^31)

    hi0 = jnp.full((lanes,), _RANS_L_HI, jnp.uint32)
    lo0 = jnp.full((lanes,), _RANS_L_LO, jnp.uint32)
    spill0 = jnp.zeros((spill_cap,), jnp.uint32)
    lens0 = jnp.zeros((lens_cap,), jnp.uint32)
    all_on = jnp.ones((lanes,), jnp.bool_)

    def body(carry, xs):
        hi, lo, spill, lens, s_cur, e_cur = carry
        starts, freqs, of, widths, payload, max_w, n_marker, any_of, xmx = xs

        hi, lo, spill, lens, s_cur, e_cur = jax.lax.cond(
            any_of,
            lambda a: _push_overflow(a[0], a[1], of, widths, payload,
                                     max_w, n_marker, a[2], a[3], a[4], a[5]),
            lambda a: a,
            (hi, lo, spill, lens, s_cur, e_cur))

        hi, lo, spill, lens, s_cur, e_cur = _push(
            hi, lo, starts, freqs, all_on, precision, xmx,
            spill, lens, s_cur, e_cur)
        return (hi, lo, spill, lens, s_cur, e_cur), None

    init = (hi0, lo0, spill0, lens0, jnp.uint32(0), jnp.uint32(0))
    xs = (plan.starts, plan.freqs, plan.of, plan.widths, plan.payload,
          plan.max_w, plan.n_marker, plan.any_of, x_max16_hi_all)
    (hi, lo, spill, lens, s_cur, e_cur), _ = jax.lax.scan(
        body, init, xs, unroll=unroll)
    return hi, lo, spill, lens, s_cur, e_cur


def assemble_stream(heads_hi, heads_lo, spill, lens, spill_count,
                    event_count) -> np.ndarray:
    """Host-side flatten: [head_hi | head_lo | spill chunks NEWEST-first]
    (lane order preserved within a chunk) — exactly ans.flatten_message /
    rans.cc Encoder::flatten."""
    heads_hi = np.asarray(heads_hi, np.uint32)
    heads_lo = np.asarray(heads_lo, np.uint32)
    spill = np.asarray(spill, np.uint32)[: int(spill_count)]
    lens = np.asarray(lens, np.int64)[: int(event_count)]
    assert int(lens.sum()) == int(spill_count)
    bounds = np.cumsum(lens)
    chunks = [spill[b - n : b] for b, n in zip(bounds, lens) if n]
    tail = (np.concatenate(chunks[::-1]) if chunks
            else np.zeros((0,), np.uint32))
    return np.concatenate([heads_hi, heads_lo, tail])
