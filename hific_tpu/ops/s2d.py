"""Space-to-depth reparametrization of the encoder's high-resolution front.

The reference encoder opens with a 7x7 stride-1 conv on 3 input channels
followed by a 3x3 stride-2 conv on 60 channels (src/network/encoder.py:
56-70). On TPU both are LAYOUT-bound, not compute-bound: NHWC tensors tile
the channel axis onto the 128-wide lane dimension, so a 3-channel
megapixel tensor occupies ~42x its nominal bytes in registers/HBM traffic
and the stem runs at ~21-30 GB/s effective (PERF.md round-1 envelope).

This module rewrites that front EXACTLY (pure weight/index reparametri-
zation — same parameters, same math, no retraining):

    reflect_pad(3) -> conv7x7(3->60) -> ChannelNorm+ReLU
        -> asym_pad -> conv3x3 s2 (60->120)

becomes, on the half-resolution space-to-depth grid,

    reflect_pad(3) -> S2D(2) -> conv4x4(12->240, VALID)     [stem, packed]
        -> per-phase ChannelNorm+ReLU                       [60ch per phase]
        -> edge_pad(top=1, right=1) -> conv2x2(240->120)    [down0]

The packed stem conv's output channel (s, t, o) holds full-res pixel
(2u+s, 2v+t) channel o, so the stride-2 down conv consumes the packed form
directly and lands at its native half resolution — no depth-to-space
materialization at all. Contraction sizes grow from 7*7*3=147 / 3*3*60=540
at full res to 4*4*12=192 / 2*2*240=960 at half res with 4x fewer spatial
positions and full lane occupancy.

Derivation (all indices in padded-image space; a/b = input row/col phase,
s/t = output row/col phase, e/f = half-res kernel taps):

  stem:  y[2u+s] = sum_di w[di] x_p[2u+s+di]; substituting
         x_p[2(u+e)+a] gives di = 2e+a-s  in [0,7)  -> e in [0,4)
  down0: z[i] = sum_di w[di] y[2i+di-1] (top-reflect pad), so the packed
         tap (e', a) maps to di = 2e'+a-1 in [0,3) -> e' in [0,2); cols
         dj = 2f+b (right-reflect pad). Out-of-range taps get ZERO weight.

The reflect paddings survive the rewrite as an `edge` pad of the packed
tensor: packed row -1 is only read at phase a=1 (= full row -1 = reflected
full row 1 = phase 1 of packed row 0), and packed col W/2 only at phase
b=0 (= full col W = reflected col W-2 = phase 0 of packed col W/2-1), so
duplicating the edge packed row/col supplies exactly the values the
nonzero weights read.

Exactness is tested against the standard path in tests/test_s2d.py (both
fp32-tight and symbol-exact through the full codec).
"""

import jax
import jax.numpy as jnp
import numpy as np

from hific_tpu.ops.channel_norm import channel_norm
from hific_tpu.ops.padding import reflect_pad


def space_to_depth2(x):
    """(N, H, W, C) -> (N, H/2, W/2, 4C); channel order (a, b, c) with a/b
    the row/col phases. H and W must be even."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // 2, w // 2, 4 * c)


def stem_kernel_s2d(w):
    """(7, 7, C, O) stride-1 kernel -> (4, 4, 4C, 4O) packed kernel.

    In-channel order (a, b, c); out-channel order (s, t, o)."""
    k, _, c, o = w.shape
    assert k == 7
    w_pad = jnp.pad(w, ((1, 1), (1, 1), (0, 0), (0, 0)))
    e = np.arange(4)[:, None, None]
    ph = np.arange(2)[None, :, None]
    out_ph = np.arange(2)[None, None, :]
    ih = 2 * e + ph - out_ph + 1          # (4, 2, 2): (e, a, s), in [0, 8]
    # w_pad[ih]: (4,2,2, 9, C, O); then index axis 3 with the col map.
    w2 = w_pad[ih][:, :, :, ih]           # (e, a, s, f, b, t, C, O)
    w2 = w2.transpose(0, 3, 1, 4, 6, 2, 5, 7)   # (e, f, a, b, C, s, t, O)
    return w2.reshape(4, 4, 4 * c, 4 * o)


def stem_bias_s2d(b):
    """(O,) -> (4O,): each output phase carries the same bias."""
    return jnp.tile(b, 4)


def down0_kernel_s2d(w):
    """(3, 3, C, O) stride-2 kernel -> (2, 2, 4C, O) packed stride-1 kernel
    consuming the packed (a, b, c) channel order."""
    k, _, c, o = w.shape
    assert k == 3
    # Rows: di = 2e' + a - 1 in [0,3); pad one zero row at the front so the
    # index 2e'+a hits w[2e'+a-1]. Cols: dj = 2f + b in [0,3); pad one zero
    # col at the back for the (f=1, b=1) -> dj=3 tap.
    w_pad = jnp.pad(w, ((1, 0), (0, 1), (0, 0), (0, 0)))
    e = np.arange(2)[:, None]
    ph = np.arange(2)[None, :]
    ih = 2 * e + ph                       # (e', a) -> row index in w_pad
    iw = 2 * e + ph                       # (f, b)  -> col index in w_pad
    w2 = w_pad[ih][:, :, iw]              # (e', a, f, b, C, O)
    w2 = w2.transpose(0, 2, 1, 3, 4, 5)   # (e', f, a, b, C, O)
    return w2.reshape(2, 2, 4 * c, o)


def _conv_valid(x, kernel):
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def encoder_front_s2d(x, w_stem, b_stem, gamma, beta, w_d0, b_d0,
                      eps: float = 1e-3, dtype=None):
    """The encoder's first two stages on the packed half-res grid.

    x: (N, H, W, 3) with H, W even (the codec pads to x16 first).
    Returns (N, H/2, W/2, 120-ish): bit-comparable to
    reflect_pad->conv_stem->ChannelNorm->ReLU->asym_pad->conv_down0 of
    models/encoder.py (the trailing norm_down0 is applied by the caller).
    """
    o_stem = w_stem.shape[-1]
    compute = dtype or x.dtype
    xp = space_to_depth2(reflect_pad(x, 3))
    y = _conv_valid(xp.astype(compute), stem_kernel_s2d(w_stem).astype(compute))
    y = y + stem_bias_s2d(b_stem).astype(y.dtype)

    # Per-phase ChannelNorm + ReLU: each (s, t) group of o_stem channels is
    # one full-res pixel's channel vector.
    n, hh, ww, _ = y.shape
    y = y.reshape(n, hh, ww, 4, o_stem)
    y = channel_norm(y, gamma.astype(y.dtype), beta.astype(y.dtype), eps=eps)
    y = jax.nn.relu(y).reshape(n, hh, ww, 4 * o_stem)

    # down0 on the packed grid; edge pad supplies the reflected taps.
    y = jnp.pad(y, ((0, 0), (1, 0), (0, 1), (0, 0)), mode="edge")
    z = _conv_valid(y, down0_kernel_s2d(w_d0).astype(y.dtype))
    return z + b_d0.astype(z.dtype)
