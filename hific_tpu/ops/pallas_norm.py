"""Fused ChannelNorm (+ activation) as a Pallas TPU kernel.

ChannelNorm reduces over the channel (lane) axis per pixel — a pure
VPU/memory-bound op applied ~28x per HiFiC forward on activations up to
(B,1024,1024,60) and (B,64,64,960). The kernel computes mean, unbiased
variance, normalization, affine, and the optional ReLU in ONE pass over
VMEM tiles: a single HBM read + write instead of the read-per-stage XLA
can emit around the reductions.

Forward is Pallas with a custom VJP; the backward is closed-form jnp (XLA
fuses it well, and it only runs in training).

Measured on TPU v5e (1MP roundtrip, bf16): XLA 76 ms vs Pallas 151 ms —
XLA already fuses the channel reduction into the surrounding convs, and
C=60 tensors waste half the 128-wide lanes after the (M, C) reshape. The
kernel therefore stays OFF by default (config.use_pallas_norm); it remains
correct (parity-tested) and useful as a fusion baseline for future kernels.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_M = 256


def _norm_kernel(x_ref, gamma_ref, beta_ref, out_ref, *, eps, act):
    x = x_ref[:].astype(jnp.float32)
    c = x.shape[-1]
    mu = jnp.mean(x, axis=-1, keepdims=True)
    centered = x - mu
    var = jnp.sum(centered * centered, axis=-1, keepdims=True) / (c - 1)
    y = centered * jax.lax.rsqrt(var + eps)
    y = y * gamma_ref[:] + beta_ref[:]
    if act == "relu":
        y = jnp.maximum(y, 0.0)
    out_ref[:] = y.astype(out_ref.dtype)


def _channel_norm_fwd_pallas(x2d, gamma, beta, eps, act):
    """x2d: (M, C) rows; returns (M, C)."""
    m, c = x2d.shape
    tile = min(_TILE_M, m)
    grid = (pl.cdiv(m, tile),)
    kernel = functools.partial(_norm_kernel, eps=eps, act=act)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, c), x2d.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=jax.default_backend() == "cpu",
    )(x2d, gamma.reshape(1, c), beta.reshape(1, c))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _channel_norm_act(x2d, gamma, beta, eps, act):
    return _channel_norm_fwd_pallas(x2d, gamma, beta, eps, act)


def _cn_fwd(x2d, gamma, beta, eps, act):
    return _channel_norm_fwd_pallas(x2d, gamma, beta, eps, act), (x2d, gamma, beta)


def _cn_bwd(eps, act, res, g):
    x, gamma, beta = res
    x = x.astype(jnp.float32)
    g = g.astype(jnp.float32)
    c = x.shape[-1]
    mu = jnp.mean(x, axis=-1, keepdims=True)
    centered = x - mu
    var = jnp.sum(centered * centered, axis=-1, keepdims=True) / (c - 1)
    r = jax.lax.rsqrt(var + eps)
    x_hat = centered * r
    if act == "relu":
        y = x_hat * gamma + beta
        g = g * (y > 0.0)
    dgamma = jnp.sum(g * x_hat, axis=0)
    dbeta = jnp.sum(g, axis=0)
    d = g * gamma
    dx = r * (d - jnp.mean(d, axis=-1, keepdims=True)
              - x_hat * jnp.sum(d * x_hat, axis=-1, keepdims=True) / (c - 1))
    return dx.astype(res[0].dtype), dgamma, dbeta


_channel_norm_act.defvjp(_cn_fwd, _cn_bwd)


def channel_norm_fused(x, gamma, beta, eps=1e-3, act="none"):
    """Fused ChannelNorm(+activation) over NHWC `x`. act: 'none' | 'relu'."""
    b, h, w, c = x.shape
    y = _channel_norm_act(x.reshape(-1, c), gamma, beta, eps, act)
    return y.reshape(b, h, w, c)
