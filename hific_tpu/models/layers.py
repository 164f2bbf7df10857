"""Conv building blocks (NHWC, flax.linen).

PyTorch conv semantics expressed the XLA way: explicit reflect/zero padding
followed by VALID convolutions, and transpose convs as input-dilated
convolutions (`lhs_dilation`) with the exact asymmetric padding implied by
torch's (padding, output_padding) pair. See SURVEY.md §7 "hard parts".
"""

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from hific_tpu.ops.channel_norm import channel_norm, instance_norm


def _pad2d(x, pad_h, pad_w, mode):
    """Pad NHWC spatial dims. pad_h/pad_w are (lo, hi) pairs."""
    if pad_h == (0, 0) and pad_w == (0, 0):
        return x
    return jnp.pad(x, ((0, 0), pad_h, pad_w, (0, 0)), mode=mode)


class Conv(nn.Module):
    """2-D convolution with torch-style integer padding.

    padding: int or ((top, bottom), (left, right)).
    padding_mode: 'zeros' | 'reflect' (matches torch Conv2d padding_mode).
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: object = 0
    padding_mode: str = "zeros"
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        p = self.padding
        if isinstance(p, int):
            pad_h = pad_w = (p, p)
        else:
            pad_h, pad_w = p
        mode = "reflect" if self.padding_mode == "reflect" else "constant"
        x = _pad2d(x, pad_h, pad_w, mode)
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding="VALID",
            use_bias=self.use_bias,
            dtype=self.dtype,
        )(x)


class _ConvParamsInner(nn.Module):
    """Declares Conv-compatible params without running the conv (used by
    reparametrized paths that consume the raw kernel). Initializers match
    nn.Conv's defaults exactly, so checkpoints are interchangeable."""

    features: int
    kernel_size: int

    @nn.compact
    def __call__(self, in_features: int):
        k = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, k, in_features, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return kernel, bias


class ConvParams(nn.Module):
    """Param-tree twin of `Conv` (path <name>/Conv_0/{kernel,bias}): lets a
    reparametrized compute path (e.g. ops/s2d.py) share the exact same
    checkpoint tree as the standard path."""

    features: int
    kernel_size: int

    @nn.compact
    def __call__(self, in_features: int):
        return _ConvParamsInner(self.features, self.kernel_size,
                                name="Conv_0")(in_features)


class ConvTransposeParams(nn.Module):
    """Param-tree twin of `ConvTranspose` (path <name>/{kernel,bias}):
    unlike Conv, ConvTranspose declares its params at the module's own
    level, so the twin does too."""

    features: int
    kernel_size: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, in_features: int):
        k = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, k, in_features, self.features),
                            self.dtype or jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          self.dtype or jnp.float32)
        return kernel, bias


class NormParams(nn.Module):
    """Param-tree twin of `Norm` (channel norm): <name>/{gamma,beta}."""

    @nn.compact
    def __call__(self, n_channels: int):
        gamma = self.param("gamma", nn.initializers.ones, (n_channels,),
                           jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (n_channels,),
                          jnp.float32)
        return gamma, beta


class ConvTranspose(nn.Module):
    """torch.nn.ConvTranspose2d equivalent via input-dilated convolution.

    output = (in - 1) * stride - 2*padding + kernel + output_padding.
    The kernel is stored in correlation (HWIO) form; the torch-checkpoint
    converter performs the spatial flip + IO transpose.
    """

    features: int
    kernel_size: int
    stride: int = 2
    padding: int = 1
    output_padding: int = 1
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        k, s, p, op = self.kernel_size, self.stride, self.padding, self.output_padding
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, in_features, self.features),
            self.dtype or x.dtype,
        )
        pad = (k - 1 - p, k - 1 - p + op)
        y = jax.lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=(1, 1),
            padding=(pad, pad),
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), self.dtype or x.dtype
            )
            y = y + bias.astype(y.dtype)
        return y


class Norm(nn.Module):
    """Channel or instance norm with learned affine, selected by flag,
    optionally fused with a trailing activation.

    Reference selects ChannelNorm2D_wrap vs InstanceNorm2D_wrap
    (src/network/encoder.py:41-44). With backend='pallas' the channel norm
    (+ activation) runs as one fused VMEM pass (ops/pallas_norm.py).
    """

    norm_type: str = "channel"  # 'channel' | 'instance' | 'none'
    activation: str = "none"    # fused trailing activation: 'none' | 'relu'
    backend: str = "xla"        # 'xla' | 'pallas'

    @nn.compact
    def __call__(self, x):
        if self.norm_type == "none":
            return x
        c = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (c,), jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (c,), jnp.float32)
        if self.norm_type == "channel":
            if self.backend == "pallas":
                from hific_tpu.ops.pallas_norm import channel_norm_fused

                return channel_norm_fused(x, gamma.astype(x.dtype),
                                          beta.astype(x.dtype),
                                          act=self.activation)
            y = channel_norm(x, gamma.astype(x.dtype), beta.astype(x.dtype))
        elif self.norm_type == "instance":
            y = instance_norm(x, gamma.astype(x.dtype), beta.astype(x.dtype))
        else:
            raise ValueError(f"unknown norm type {self.norm_type}")
        if self.activation == "relu":
            y = jax.nn.relu(y)
        elif self.activation != "none":
            y = activation_fn(self.activation)(y)
        return y


def activation_fn(name: str) -> Callable:
    return {
        "relu": jax.nn.relu,
        "elu": jax.nn.elu,
        "leaky_relu": lambda x: jax.nn.leaky_relu(x, 0.01),
    }[name]


class SNConv(nn.Module):
    """Spectrally-normalized conv (power iteration, torch-compatible).

    sigma is estimated on the kernel reshaped to (out, in*kh*kw), exactly as
    torch.nn.utils.spectral_norm reshapes (O, I, kh, kw) -> (O, -1)
    (reference: src/network/discriminator.py:46-62). The power-iteration
    vector `u` lives in the `spectral` variable collection and is updated
    once per call when that collection is mutable.
    """

    features: int
    kernel_size: int
    stride: int = 2
    padding: int = 1
    padding_mode: str = "reflect"
    eps: float = 1e-12

    @nn.compact
    def __call__(self, x, update_stats: bool = True):
        k = self.kernel_size
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, in_features, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)

        # (O, I*kh*kw) matrix, matching torch's view of (O,I,kh,kw).
        w_mat = kernel.transpose(3, 2, 0, 1).reshape(self.features, -1)

        u_var = self.variable(
            "spectral",
            "u",
            lambda: jax.random.normal(
                self.make_rng("params") if self.has_rng("params") else jax.random.PRNGKey(0),
                (self.features,),
            ),
        )
        u = u_var.value

        def _l2norm(v):
            return v / (jnp.linalg.norm(v) + self.eps)

        w_ng = jax.lax.stop_gradient(w_mat)
        v = _l2norm(w_ng.T @ u)
        u_new = _l2norm(w_ng @ v)
        if update_stats and not self.is_initializing():
            u_var.value = u_new
        sigma = jnp.dot(u_new, w_mat @ v)
        kernel_sn = kernel / sigma

        pad = (self.padding, self.padding)
        mode = "reflect" if self.padding_mode == "reflect" else "constant"
        x = _pad2d(x, pad, pad, mode)
        y = jax.lax.conv_general_dilated(
            x,
            kernel_sn.astype(x.dtype),
            window_strides=(self.stride, self.stride),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(y.dtype)
