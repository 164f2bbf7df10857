"""Quantization relaxations and entropy bookkeeping.

TPU-native equivalents of the reference CodingModel quantizers
(src/hyperprior.py:57-122). All functions are pure and trace cleanly under
jit/grad.
"""

import jax
import jax.numpy as jnp
import numpy as np

LOG2_E_NEG = 1.0 / np.log(2.0)


def quantize_noise(x, rng):
    """Additive U(-1/2, 1/2) noise relaxation of rounding.

    Reference: src/hyperprior.py:64-66.
    """
    noise = jax.random.uniform(rng, x.shape, dtype=x.dtype, minval=-0.5, maxval=0.5)
    return x + noise


def quantize_round(x, means=None):
    """Hard quantization by rounding, optionally mean-offset.

    Uses floor(x + 0.5) to match the reference exactly (torch.floor(x+0.5)
    rounds half away from floor in the same way on both platforms).
    Reference: src/hyperprior.py:68-74.
    """
    if means is not None:
        return jnp.floor(x - means + 0.5) + means
    return jnp.floor(x + 0.5)


def quantize_ste(x, means=None):
    """Straight-through rounding: forward = round, backward = identity.

    Reference: src/hyperprior.py:108-122 (quantize_latents_st).
    """
    if means is not None:
        v = x - means
        v = v + jax.lax.stop_gradient(jnp.floor(v + 0.5) - v)
        return v + means
    return x + jax.lax.stop_gradient(jnp.floor(x + 0.5) - x)


def estimate_entropy(likelihood, spatial_shape, eps=1e-9):
    """Total bits (per batch element) and bpp from per-element likelihoods.

    bpp is normalized by the ORIGINAL image pixel count, not the latent size
    (reference: src/hyperprior.py:80-93).
    """
    batch_size = likelihood.shape[0]
    n_pixels = float(np.prod(spatial_shape))
    log_likelihood = jnp.log(likelihood + eps)
    n_bits = jnp.sum(log_likelihood) * (-LOG2_E_NEG) / batch_size
    return n_bits, n_bits / n_pixels


def estimate_entropy_log(log_likelihood, spatial_shape):
    """As `estimate_entropy` but from log-likelihoods (DLMM path).

    Reference: src/hyperprior.py:95-106.
    """
    batch_size = log_likelihood.shape[0]
    n_pixels = float(np.prod(spatial_shape))
    n_bits = jnp.sum(log_likelihood) * (-LOG2_E_NEG) / batch_size
    return n_bits, n_bits / n_pixels
