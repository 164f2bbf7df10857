"""Depth-to-space reparametrization of the generator's full-resolution tail.

The reference generator ends with ConvTranspose(3x3, s2, p1, op1) 120->60,
ChannelNorm + ReLU, then a reflect-padded 7x7 projection to RGB at FULL
image resolution (src/network/generator.py:137-166). On TPU both full-res
stages are LAYOUT-bound: 60 and 3 channels occupy less than half / ~2% of
the 128-wide lane dimension, so the tail runs far under the conv roofline
(PERF.md round-3 MFU table: the eval forward's bandwidth gap IS this tail).

This module rewrites the tail EXACTLY (pure weight/index reparametrization
— same parameters, same math, no retraining), keeping every tensor at the
HALF-resolution grid with 4x the channels and materializing full res only
in the final (free) depth-to-space reshape:

    ConvTranspose3x3 s2 (120->60) -> ChannelNorm+ReLU
        -> reflect_pad(3) -> conv7x7(60->3)

becomes

    zero_pad(bottom=1, right=1) -> conv2x2(120->240, VALID)   [upconv, packed]
        -> per-phase ChannelNorm+ReLU                          [60ch per phase]
        -> phase-shuffled reflect pad(2) -> conv5x5(240->12)   [proj, packed]
        -> depth_to_space(2)                                   [reshape only]

Derivation (rows; columns are identical). Our ConvTranspose computes
out[r] = sum_{di in [0,3)} w[di] * xd[r + di - 1] with xd the 2x
input-dilated sequence (models/layers.py: pad = (k-1-p, k-1-p+op) = (1,2)).
Writing r = 2i+s and the only nonzero dilated entries xd[2u] = x[u]:

  upconv: 2i+s+di-1 = 2(i+e)  =>  di = 2e + 1 - s, di in [0,3)
          -> phase s=0 reads tap w[1] from x[i];
             phase s=1 reads w[0] from x[i] and w[2] from x[i+1].
          The packed 2x2 kernel's (e=1, s=0) taps are ZERO, and the
          x[i+1] read at i=H-1 falls in the transpose-conv's zero padding
          -> one zero row/col appended at the bottom/right.

  proj:   out[r] = sum_{d in [0,7)} w7[d] * y[r + d - 3] on the
          reflect(3)-padded full-res y. Substituting y's packed row
          2(i+e')+a with e' = e-2: d = 2e + a - s - 1 in [0,7) for
          e in [0,5) -> a 5x5 packed kernel (49 of 100 (e,a)x(f,b) taps
          nonzero per output phase), reading packed rows i-2..i+2.

The full-res reflect padding becomes a PHASE-SHUFFLED pad of the packed
tensor: full row -q reflects to +q, so e.g. packed row -1 = full rows
(-2,-1) = full rows (2,1) = [packed row 1 phase 0 | packed row 0 phase 1]
— a channel-block permutation of existing rows, built by slice+concat
(4 rows/cols at H/2 cost; no full-res tensor is ever formed). Packed slots
that only reflect-read beyond the 3-pixel pad (e.g. packed row -2 phase 0
= full row -4) are provably zero-weighted, so they carry a clamped
placeholder.

Measured on v5e at flagship shapes (120ch@512^2 -> 3ch@1024^2, bf16): the
packed tail runs ~22% faster than the standard one (11.2 vs 14.4 ms/img)
despite ~2x nominal MACs — the tail is layout/bandwidth-bound, not
FLOP-bound. Exactness is tested in tests/test_d2s.py (fp64-tight, fp32,
and through the full codec decode).
"""

import jax
import jax.numpy as jnp
import numpy as np

from hific_tpu.ops.channel_norm import channel_norm


def depth_to_space2(x):
    """(N, H, W, 4C) -> (N, 2H, 2W, C); channel order (s, t, c) with s/t
    the output row/col phases."""
    n, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(n, h, w, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, 2 * h, 2 * w, c)


def upconv_kernel_d2s(w):
    """(3, 3, C, O) ConvTranspose kernel (HWIO correlation form, as stored
    by models/layers.ConvTranspose) -> (2, 2, C, 4O) packed stride-1 kernel.

    Out-channel order (s, t, o). Tap map: di = 2e + 1 - s (rows),
    dj = 2f + 1 - t (cols); out-of-range taps get ZERO weight."""
    k, _, c, o = w.shape
    assert k == 3
    w_pad = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))  # index 3 -> zero
    e = np.arange(2)[:, None]
    s = np.arange(2)[None, :]
    ih = 2 * e + 1 - s                    # (e, s) in {0..3}, 3 == zero row
    w2 = w_pad[ih][:, :, ih]              # (e, s, f, t, C, O)
    w2 = w2.transpose(0, 2, 4, 1, 3, 5)   # (e, f, C, s, t, O)
    return w2.reshape(2, 2, c, 4 * o)


def upconv_bias_d2s(b):
    """(O,) -> (4O,): each output phase carries the same bias."""
    return jnp.tile(b, 4)


def proj_kernel_d2s(w):
    """(7, 7, C, O) stride-1 kernel -> (5, 5, 4C, 4O) packed kernel.

    In-channel order (a, b, c); out-channel order (s, t, o). Tap map:
    d = 2e + a - s - 1 (rows, e in [0,5)), in [0,7) else zero."""
    k, _, c, o = w.shape
    assert k == 7
    w_pad = jnp.pad(w, ((2, 2), (2, 2), (0, 0), (0, 0)))
    e = np.arange(5)[:, None, None]
    a = np.arange(2)[None, :, None]
    s = np.arange(2)[None, None, :]
    ih = 2 * e + a - s + 1                # (e, a, s): pad-shifted, in [0, 11)
    w2 = w_pad[ih][:, :, :, ih]           # (e, a, s, f, b, t, C, O)
    w2 = w2.transpose(0, 3, 1, 4, 6, 2, 5, 7)   # (e, f, a, b, C, s, t, O)
    return w2.reshape(5, 5, 4 * c, 4 * o)


def proj_bias_d2s(b):
    return jnp.tile(b, 4)


def _packed_reflect_rows(y):
    """Pad packed rows by 2 on each side with the phase-shuffled rows that
    reproduce a full-res reflect(3) pad. y: (N, H, W, 2, 2, C) with axes
    (row phase a, col phase b)."""
    h = y.shape[1]
    a0, a1 = y[:, :, :, 0], y[:, :, :, 1]     # (N, H, W, 2, C) each

    def row(phase0_src, phase1_src):
        # a0/a1 slices are (N, W, b, C); stack the row-phase axis BEFORE
        # the col-phase axis to restore (N, 1, W, a, b, C)
        return jnp.stack([a0[:, phase0_src], a1[:, phase1_src]],
                         axis=2)[:, None]

    # packed row -p, phase a = full row -2p+a -> reflect -> full 2p-a:
    #   a=0 -> packed p phase 0; a=1 -> packed p-1 phase 1.
    # row -2 phase 0 (full -4) is beyond the reflect(3) pad: zero-weighted,
    # clamped placeholder.
    top = jnp.concatenate([row(min(2, h - 1), 1), row(1, 0)], axis=1)
    # packed row H+p, phase a = full 2(H+p)+a -> reflect (2H-1+q -> 2H-1-q):
    #   row H:   a=0 -> packed H-1 phase 0; a=1 -> packed H-2 phase 1.
    #   row H+1: a=0 -> packed H-2 phase 0; a=1 beyond pad (zero-weighted).
    bot = jnp.concatenate([row(h - 1, h - 2), row(h - 2, max(h - 2, 0))],
                          axis=1)
    return jnp.concatenate([top, y, bot], axis=1)


def packed_reflect_pad2(y):
    """(N, H, W, 4C) packed tensor (channel order (a, b, c)) -> (N, H+4,
    W+4, 4C): the packed-space image of reflect_pad(x_full, 3). Needs
    H, W >= 2."""
    n, h, w, c4 = y.shape
    assert h >= 2 and w >= 2, "packed reflect pad needs H, W >= 2"
    c = c4 // 4
    y = y.reshape(n, h, w, 2, 2, c)
    y = _packed_reflect_rows(y)
    # columns: same construction on axis 2 / col-phase axis 4 (sequential
    # row-then-col padding reproduces the double-reflect corners of
    # jnp.pad(..., 'reflect') exactly, as reflect is separable per axis)
    y = y.transpose(0, 2, 1, 4, 3, 5)
    y = _packed_reflect_rows(y)
    y = y.transpose(0, 2, 1, 4, 3, 5)
    return y.reshape(n, h + 4, w + 4, c4)


def _conv_valid(x, kernel):
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def generator_tail_d2s(x, w_up, b_up, gamma, beta, w_out, b_out,
                       eps: float = 1e-3, dtype=None):
    """The generator's last upsample + RGB projection on the packed
    half-res grid.

    x: (N, H, W, C) activations entering the final ConvTranspose (i.e.
    after norm_up2's activation). Returns (N, 2H, 2W, 3), bit-comparable
    to ConvTranspose->ChannelNorm+ReLU->reflect_pad(3)->Conv7x7 of
    models/generator.py.
    """
    o_up = w_up.shape[-1]
    compute = dtype or x.dtype
    # packed upconv: the (s=1, e/f=1) taps read x[i+1], which at the last
    # row/col falls in the transpose conv's zero padding
    xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    y = _conv_valid(xp.astype(compute), upconv_kernel_d2s(w_up).astype(compute))
    y = y + upconv_bias_d2s(b_up).astype(y.dtype)

    # per-phase ChannelNorm + ReLU: each (s, t) block of o_up channels is
    # one full-res pixel's channel vector
    n, hh, ww, _ = y.shape
    y = y.reshape(n, hh, ww, 4, o_up)
    y = channel_norm(y, gamma.astype(y.dtype), beta.astype(y.dtype), eps=eps)
    y = jax.nn.relu(y).reshape(n, hh, ww, 4 * o_up)

    yp = packed_reflect_pad2(y)
    z = _conv_valid(yp, proj_kernel_d2s(w_out).astype(yp.dtype))
    z = z + proj_bias_d2s(b_out).astype(z.dtype)
    return depth_to_space2(z)
