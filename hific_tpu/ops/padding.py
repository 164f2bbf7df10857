"""Spatial padding helpers (NHWC layout).

Matches PyTorch ReflectionPad2d semantics used throughout the reference
(src/network/encoder.py:46-48, src/helpers/utils.py:50-62) but operating on
NHWC tensors, the TPU-preferred layout.
"""

import jax.numpy as jnp


def reflect_pad(x, pad):
    """Symmetric reflect-pad H and W of an NHWC tensor by `pad` pixels.

    Equivalent to torch.nn.ReflectionPad2d(pad) on NCHW.
    """
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def asymmetric_pad_2x(x):
    """Reflect-pad (left=0, right=1, top=1, bottom=0) before a stride-2 valid
    3x3 conv, so spatial dims halve exactly.

    Equivalent to torch.nn.ReflectionPad2d((0, 1, 1, 0)) on NCHW
    (reference: src/network/encoder.py:47).
    """
    return jnp.pad(x, ((0, 0), (1, 0), (0, 1), (0, 0)), mode="reflect")


def pad_factor(x, factor):
    """Reflect-pad H and W of NHWC `x` (on the bottom/right) to multiples of
    `factor`. The arbitrary-resolution mechanism (reference:
    src/helpers/utils.py:50-62).

    `factor` may be an int or an (fh, fw) pair.
    """
    if isinstance(factor, int):
        fh = fw = factor
    else:
        fh, fw = factor
    h, w = x.shape[1], x.shape[2]
    pad_h = (fh - (h % fh)) % fh
    pad_w = (fw - (w % fw)) % fw
    if pad_h == 0 and pad_w == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
