"""Probability densities for the bottleneck.

- `HyperlatentDensity`: learned non-parametric factorized density over
  hyperlatents (Ballé 2018 §6.1). Behavioral spec from reference
  src/compression/hyperprior_model.py:252-387, re-expressed as a flax module
  whose per-channel "MLP flow" is evaluated as one batched einsum per layer —
  an MXU-friendly contraction over all channels at once.

- `latent_likelihood`: boxcar-convolved Gaussian/logistic likelihood for the
  conditional latent prior (reference src/hyperprior.py:124-139,
  src/compression/prior_model.py:300-311).
"""

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from hific_tpu.ops.maths import (
    lower_bound_toward,
    standardized_cdf_gaussian,
    standardized_cdf_logistic,
)

MIN_SCALE = 0.11
LOG_SCALES_MIN = -3.0
MIN_LIKELIHOOD = 1e-9
MAX_LIKELIHOOD = 1e3
TAIL_MASS = 2 ** (-8)
PRECISION_P = 16


def standardized_cdf(likelihood_type: str):
    if likelihood_type == "gaussian":
        return standardized_cdf_gaussian
    if likelihood_type == "logistic":
        return standardized_cdf_logistic
    raise ValueError(f"unknown likelihood model: {likelihood_type}")


def latent_likelihood(x, mean, scale, likelihood_type="gaussian",
                      min_likelihood=MIN_LIKELIHOOD):
    """P(round(y) = x | mu, sigma) via CDF(x+1/2) - CDF(x-1/2), evaluated with
    the symmetric-tail trick for numerical stability: both CDF arguments are
    folded into the left tail using 1 - CDF(x) = CDF(-x).

    Reference: src/hyperprior.py:124-139.
    """
    cdf = standardized_cdf(likelihood_type)
    xc = jnp.abs(x - mean)
    cdf_upper = cdf((0.5 - xc) / scale)
    cdf_lower = cdf(-(0.5 + xc) / scale)
    return lower_bound_toward(cdf_upper - cdf_lower, min_likelihood)


def dlmm_log_likelihood(x, dlmm_params, likelihood_type="gaussian",
                        min_likelihood=MIN_LIKELIHOOD):
    """Discretized logistic-mixture log-likelihood (K components).

    x: (N,H,W,C); dlmm_params: (N,H,W,C*K*3). Returns (N,H,W,C).
    Reference: src/hyperprior.py:381-402.
    """
    from hific_tpu.models.hyper import unpack_likelihood_params

    cdf = standardized_cdf(likelihood_type)
    x, (logit_pis, means, log_scales), _ = unpack_likelihood_params(
        x, dlmm_params, LOG_SCALES_MIN
    )
    xc = jnp.abs(x - means)
    inv_stds = jnp.exp(-log_scales)
    cdf_upper = cdf(inv_stds * (0.5 - xc))
    cdf_lower = cdf(inv_stds * (-0.5 - xc))
    pmf_k = lower_bound_toward(cdf_upper - cdf_lower, min_likelihood)
    lse_in = jax.nn.log_softmax(logit_pis, axis=-1) + jnp.log(pmf_k)
    return jax.nn.logsumexp(lse_in, axis=-1)


class HyperlatentDensity(nn.Module):
    """Learned factorized density over hyperlatents, one univariate model per
    channel, evaluated in parallel across channels.

    The CDF is parameterized as a stack of monotone 1-D maps
        logits <- softplus(H_k) @ logits + b_k + tanh(a_k) * tanh(logits)
    with filter widths (1, 3, 3, 3, 1). Reference:
    src/compression/hyperprior_model.py:286-326.
    """

    n_channels: int
    init_scale: float = 10.0
    filters: Tuple[int, ...] = (3, 3, 3)
    min_likelihood: float = MIN_LIKELIHOOD

    def setup(self):
        dims = (1,) + tuple(self.filters) + (1,)
        scale = self.init_scale ** (1.0 / (len(self.filters) + 1))
        hs, as_, bs = [], [], []
        for k in range(len(self.filters) + 1):
            h_init = float(np.log(np.expm1(1.0 / scale / dims[k + 1])))
            hs.append(
                self.param(
                    f"H_{k}",
                    lambda rng, shape, v=h_init: jnp.full(shape, v, jnp.float32),
                    (self.n_channels, dims[k + 1], dims[k]),
                )
            )
            as_.append(
                self.param(
                    f"a_{k}", nn.initializers.zeros,
                    (self.n_channels, dims[k + 1], 1), jnp.float32,
                )
            )
            bs.append(
                self.param(
                    f"b_{k}",
                    lambda rng, shape: jax.random.uniform(
                        rng, shape, jnp.float32, -0.5, 0.5
                    ),
                    (self.n_channels, dims[k + 1], 1),
                )
            )
        self.H = tuple(hs)
        self.a = tuple(as_)
        self.b = tuple(bs)

    def cdf_logits(self, x, stop_gradient=False):
        """Evaluate CDF logits at `x` of shape (C, 1, M)."""
        logits = x
        for H_k, a_k, b_k in zip(self.H, self.a, self.b):
            if stop_gradient:
                H_k = jax.lax.stop_gradient(H_k)
                a_k = jax.lax.stop_gradient(a_k)
                b_k = jax.lax.stop_gradient(b_k)
            # Batched per-channel matmul: (C, f_out, f_in) @ (C, f_in, M).
            logits = jnp.einsum(
                "cof,cfm->com", jax.nn.softplus(H_k), logits,
                precision=jax.lax.Precision.HIGHEST,
            )
            logits = logits + b_k
            logits = logits + jnp.tanh(a_k) * jnp.tanh(logits)
        return logits

    def likelihood_collapsed(self, x):
        """Likelihood for x of shape (C, 1, M)."""
        cdf_upper = self.cdf_logits(x + 0.5)
        cdf_lower = self.cdf_logits(x - 0.5)
        # Evaluate the sigmoid difference in whichever tail is more stable.
        sign = jax.lax.stop_gradient(-jnp.sign(cdf_upper + cdf_lower))
        lik = jnp.abs(
            jax.nn.sigmoid(sign * cdf_upper) - jax.nn.sigmoid(sign * cdf_lower)
        )
        return lower_bound_toward(lik, self.min_likelihood)

    def __call__(self, x):
        """Likelihood for NHWC `x`; returns same shape."""
        n, h, w, c = x.shape
        # (N,H,W,C) -> (C,1,N*H*W)
        flat = x.transpose(3, 0, 1, 2).reshape(c, 1, -1)
        lik = self.likelihood_collapsed(flat)
        return lik.reshape(c, n, h, w).transpose(1, 2, 3, 0)
