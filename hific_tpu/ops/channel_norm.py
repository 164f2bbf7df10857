"""ChannelNorm — HiFiC's signature normalisation.

Normalizes over the CHANNEL dimension per spatial position (reference:
src/normalisation/channel.py:29-59). In NHWC the channel axis is the TPU
lane dimension, so the reduction is a cheap within-register op; the whole
norm (+ optional activation) fuses into one VPU pass.

Parity note: torch.var defaults to the UNBIASED estimator (N-1 divisor);
we match that so converted reference checkpoints are bit-comparable.
"""

import jax
import jax.numpy as jnp


def channel_norm(x, gamma, beta, eps=1e-3):
    """Normalize NHWC `x` over the channel (last) axis, then affine.

    gamma/beta: shape (C,) scale and shift.
    """
    c = x.shape[-1]
    mu = jnp.mean(x, axis=-1, keepdims=True)
    centered = x - mu
    # Unbiased variance to match torch.var (N-1 divisor).
    var = jnp.sum(centered * centered, axis=-1, keepdims=True) / (c - 1)
    x_normed = centered * jax.lax.rsqrt(var + eps)
    return x_normed * gamma + beta


def instance_norm(x, gamma, beta, eps=1e-5):
    """InstanceNorm2d equivalent on NHWC: normalize over spatial dims per
    (batch, channel). Reference: src/normalisation/instance.py:8-16.

    torch.nn.InstanceNorm2d uses the biased variance estimator.
    """
    mu = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    x_normed = (x - mu) * jax.lax.rsqrt(var + eps)
    return x_normed * gamma + beta
