"""Conditional patchGAN discriminator, NHWC.

Behavioral spec from reference src/network/discriminator.py:35-86:
conditioning branch (3x3 conv C->12 + LeakyReLU(0.2) + nearest x16 upsample)
concatenated with the image; four spectral-normalized 4x4 stride-2 convs
(64/128/256/512, reflect pad 1) + LeakyReLU(0.2); 1x1 conv -> 1 logit per
patch reshaped to (-1, 1).
"""

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from hific_tpu.models.layers import Conv, SNConv

DISC_FILTERS = (64, 128, 256, 512)


class Discriminator(nn.Module):
    context_C_out: int = 12
    upsample_factor: int = 16
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, y, update_stats: bool = True):
        """x: images (N,H,W,3); y: quantized latents (N,H/16,W/16,C)."""
        lrelu = lambda v: jax.nn.leaky_relu(v, 0.2)

        y = Conv(self.context_C_out, 3, stride=1, padding=1,
                 padding_mode="reflect", dtype=self.dtype, name="context_conv")(y)
        y = lrelu(y)
        # Nearest-neighbour x16 upsample.
        f = self.upsample_factor
        y = jnp.repeat(jnp.repeat(y, f, axis=1), f, axis=2)

        x = jnp.concatenate([x, y], axis=-1)
        for i, filters in enumerate(DISC_FILTERS):
            x = SNConv(filters, 4, stride=2, padding=1, padding_mode="reflect",
                       name=f"conv{i + 1}")(x, update_stats=update_stats)
            x = lrelu(x)

        out_logits = Conv(1, 1, stride=1, dtype=self.dtype, name="conv_out")(x)
        out_logits = out_logits.reshape(-1, 1)
        return jax.nn.sigmoid(out_logits), out_logits
