"""Analysis transform (image -> latents), NHWC.

Behavioral spec from reference src/network/encoder.py:56-111:
7x7 stem to 60ch, four asymmetric-reflect-padded stride-2 3x3 convs
(120/240/480/960), each followed by ChannelNorm + activation, then a
reflect-padded 3x3 projection to C latent channels. 16x spatial reduction.
"""

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from hific_tpu.models.layers import Conv, ConvParams, Norm, NormParams
from hific_tpu.ops.padding import asymmetric_pad_2x, reflect_pad

ENCODER_FILTERS = (60, 120, 240, 480, 960)


class Encoder(nn.Module):
    C: int = 220  # bottleneck depth
    activation: str = "relu"
    norm_type: str = "channel"
    norm_backend: str = "xla"
    dtype: Optional[jnp.dtype] = None
    # Run the stem + first downsample on the space-to-depth half-res grid
    # (ops/s2d.py): exact weight reparametrization of the same params, ~4x
    # better lane occupancy on the layout-bound high-res stages. Only valid
    # with channel norm + relu (the per-phase norm fusion).
    s2d_front: bool = False

    n_downsampling_layers: int = 4

    @nn.compact
    def __call__(self, x):
        f = ENCODER_FILTERS

        use_s2d = (self.s2d_front and self.norm_type == "channel"
                   and self.activation == "relu"
                   and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0)
        if use_s2d:
            from hific_tpu.ops.s2d import encoder_front_s2d

            w_s, b_s = ConvParams(f[0], 7, name="conv_stem")(x.shape[-1])
            gamma, beta = NormParams(name="norm_stem")(f[0])
            w_d, b_d = ConvParams(f[1], 3, name="conv_down0")(f[0])
            x = encoder_front_s2d(x, w_s, b_s, gamma, beta, w_d, b_d,
                                  dtype=self.dtype)
            x = Norm(self.norm_type, self.activation, self.norm_backend,
                     name="norm_down0")(x)
            start = 1
        else:
            x = reflect_pad(x, 3)
            x = Conv(f[0], 7, stride=1, dtype=self.dtype, name="conv_stem")(x)
            x = Norm(self.norm_type, self.activation, self.norm_backend,
                     name="norm_stem")(x)
            start = 0

        for i in range(start, 4):
            x = asymmetric_pad_2x(x)
            x = Conv(f[i + 1], 3, stride=2, dtype=self.dtype, name=f"conv_down{i}")(x)
            x = Norm(self.norm_type, self.activation, self.norm_backend,
                     name=f"norm_down{i}")(x)

        x = reflect_pad(x, 1)
        x = Conv(self.C, 3, stride=1, dtype=self.dtype, name="conv_out")(x)
        return x
