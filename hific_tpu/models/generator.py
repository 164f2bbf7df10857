"""Synthesis transform (quantized latents -> image), NHWC.

Behavioral spec from reference src/network/generator.py:98-168:
ChannelNorm head conv to 960ch + ChannelNorm, optional noise concat,
n residual blocks at latent resolution, global skip (x += head), four
ConvTranspose(3x3, s2, p1, op1) upsamples 960->480->240->120->60 each with
ChannelNorm + activation, and a 7x7 projection to RGB.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from hific_tpu.models.layers import (Conv, ConvParams, ConvTranspose,
                                     ConvTransposeParams, Norm, NormParams)
from hific_tpu.ops.padding import reflect_pad

GENERATOR_FILTERS = (960, 480, 240, 120, 60)


class ResidualBlock(nn.Module):
    activation: str = "relu"
    norm_type: str = "channel"
    norm_backend: str = "xla"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        res = reflect_pad(x, 1)
        res = Conv(c, 3, stride=1, dtype=self.dtype, name="conv1")(res)
        res = Norm(self.norm_type, self.activation, self.norm_backend,
                   name="norm1")(res)
        res = reflect_pad(res, 1)
        res = Conv(c, 3, stride=1, dtype=self.dtype, name="conv2")(res)
        res = Norm(self.norm_type, backend=self.norm_backend, name="norm2")(res)
        return res + x


class Generator(nn.Module):
    C: int = 220
    n_residual_blocks: int = 9
    activation: str = "relu"
    norm_type: str = "channel"
    norm_backend: str = "xla"
    sample_noise: bool = False
    noise_dim: int = 32
    use_remat: bool = False  # jax.checkpoint each resblock: trade FLOPs for
    # HBM so large batches fit (the residual trunk holds 2 x 960ch
    # activations per block otherwise)
    dtype: Optional[jnp.dtype] = None
    # Run the final upsample + RGB projection on the depth-to-space packed
    # half-res grid (ops/d2s.py): exact weight reparametrization of the
    # same params; the full-res 60ch/3ch stages are layout-bound on TPU.
    # Only valid with channel norm + relu (the per-phase norm fusion).
    d2s_tail: bool = False

    n_upsampling_layers: int = 4

    @nn.compact
    def __call__(self, y, rng=None):
        f = GENERATOR_FILTERS

        head = Norm(self.norm_type, backend=self.norm_backend, name="norm_in")(y)
        head = reflect_pad(head, 1)
        head = Conv(f[0], 3, stride=1, dtype=self.dtype, name="conv_head")(head)
        head = Norm(self.norm_type, backend=self.norm_backend,
                    name="norm_head")(head)

        if self.sample_noise:
            if rng is None:
                rng = self.make_rng("noise")
            b, h, w, _ = head.shape
            z = jax.random.normal(rng, (b, h, w, self.noise_dim), dtype=head.dtype)
            head = jnp.concatenate([head, z], axis=-1)

        x = head
        block_cls = nn.remat(ResidualBlock) if self.use_remat else ResidualBlock
        for m in range(self.n_residual_blocks):
            x = block_cls(
                self.activation, self.norm_type, self.norm_backend,
                self.dtype, name=f"resblock_{m}"
            )(x)
        x = x + head  # global skip (reference generator.py:161)

        use_d2s = (self.d2s_tail and self.norm_type == "channel"
                   and self.activation == "relu")
        last = 3 if use_d2s else 4
        for i in range(last):
            x = ConvTranspose(
                f[i + 1], 3, stride=2, padding=1, output_padding=1,
                dtype=self.dtype, name=f"upconv{i}",
            )(x)
            x = Norm(self.norm_type, self.activation, self.norm_backend,
                     name=f"norm_up{i}")(x)

        if use_d2s:
            from hific_tpu.ops.d2s import generator_tail_d2s

            w_up, b_up = ConvTransposeParams(f[4], 3, dtype=self.dtype,
                                             name="upconv3")(f[3])
            gamma, beta = NormParams(name="norm_up3")(f[4])
            w_out, b_out = ConvParams(3, 7, name="conv_out")(f[4])
            return generator_tail_d2s(x, w_up, b_up, gamma, beta,
                                      w_out, b_out, dtype=self.dtype)

        x = reflect_pad(x, 3)
        x = Conv(3, 7, stride=1, dtype=self.dtype, name="conv_out")(x)
        return x
