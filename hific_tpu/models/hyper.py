"""Hyperprior analysis/synthesis transforms (Ballé 2018), NHWC.

Behavioral spec from reference src/network/hyper.py:36-130.
"""

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from hific_tpu.models.layers import Conv, ConvTranspose, activation_fn
from hific_tpu.ops.maths import lower_bound_toward


def get_num_dlmm_channels(C, K=4, n_params=3):
    """Channels needed for a K-component discretized logistic mixture:
    per latent channel, K each of (mixture logit, mean, log-scale).
    Reference: src/network/hyper.py:8-13."""
    return C * K * n_params


def unpack_likelihood_params(x, conv_out, log_scales_min):
    """Split DLMM head output into (logit_pis, means, log_scales), each
    (N, H, W, C, K), and reshape x to (N, H, W, C, 1).
    Reference: src/network/hyper.py:18-33 (NCHW there, NHWC here)."""
    n, h, w, c = x.shape
    k_agg = conv_out.shape[-1]
    K = k_agg // (3 * c)
    conv_out = conv_out.reshape(n, h, w, 3, c, K)
    logit_pis = conv_out[:, :, :, 0]
    means = conv_out[:, :, :, 1]
    log_scales = lower_bound_toward(conv_out[:, :, :, 2], log_scales_min)
    x = x.reshape(n, h, w, c, 1)
    return x, (logit_pis, means, log_scales), K


class HyperpriorAnalysis(nn.Module):
    """latents (C ch) -> hyperlatents (N ch), 4x spatial reduction.

    conv1 3x3 s1 zero-pad, then two 5x5 s2 reflect-padded convs; ReLU between
    layers, final layer linear (reference hyper.py:45-63).
    """

    N: int = 320
    activation: str = "relu"
    dtype: Optional[jnp.dtype] = None

    n_downsampling_layers: int = 2

    @nn.compact
    def __call__(self, x):
        act = activation_fn(self.activation)
        x = Conv(self.N, 3, stride=1, padding=1, padding_mode="zeros",
                 dtype=self.dtype, name="conv1")(x)
        x = act(x)
        x = Conv(self.N, 5, stride=2, padding=2, padding_mode="reflect",
                 dtype=self.dtype, name="conv2")(x)
        x = act(x)
        x = Conv(self.N, 5, stride=2, padding=2, padding_mode="reflect",
                 dtype=self.dtype, name="conv3")(x)
        return x


class HyperpriorSynthesis(nn.Module):
    """hyperlatents (N ch) -> latent distribution params (C ch), 4x upsample.

    Two ConvTranspose(5x5, s2, p2, op1) + ReLU, then 3x3 s1 zero-padded conv;
    optional final activation (reference hyper.py:66-97). Instantiated twice
    in the hyperprior (mu net and sigma net).
    """

    C: int = 220
    N: int = 320
    activation: str = "relu"
    final_activation: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        act = activation_fn(self.activation)
        x = ConvTranspose(self.N, 5, stride=2, padding=2, output_padding=1,
                          dtype=self.dtype, name="conv1")(x)
        x = act(x)
        x = ConvTranspose(self.N, 5, stride=2, padding=2, output_padding=1,
                          dtype=self.dtype, name="conv2")(x)
        x = act(x)
        x = Conv(self.C, 3, stride=1, padding=1, padding_mode="zeros",
                 dtype=self.dtype, name="conv3")(x)
        if self.final_activation is not None:
            x = activation_fn(self.final_activation)(x)
        return x


class HyperpriorSynthesisDLMM(nn.Module):
    """DLMM variant: adds a 1x1 head emitting C*K*3 mixture parameters
    (reference hyper.py:100-130)."""

    C: int = 64
    N: int = 320
    activation: str = "relu"
    final_activation: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        act = activation_fn(self.activation)
        x = ConvTranspose(self.N, 5, stride=2, padding=2, output_padding=1,
                          dtype=self.dtype, name="conv1")(x)
        x = act(x)
        x = ConvTranspose(self.N, 5, stride=2, padding=2, output_padding=1,
                          dtype=self.dtype, name="conv2")(x)
        x = act(x)
        x = Conv(self.C, 3, stride=1, padding=1, padding_mode="zeros",
                 dtype=self.dtype, name="conv3")(x)
        x = Conv(get_num_dlmm_channels(self.C), 1, stride=1,
                 dtype=self.dtype, name="conv_out")(x)
        if self.final_activation is not None:
            x = activation_fn(self.final_activation)(x)
        return x
