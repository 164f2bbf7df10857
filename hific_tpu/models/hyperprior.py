"""Hyperprior bottleneck: probabilistic model over latents-of-latents.

Training-mode forward computes BOTH the noisy (differential-entropy) and
quantized (Shannon-entropy) bpp estimates for latents and hyperlatents, uses
noisy hyperlatents as input to the synthesis transforms during training, and
returns STE-quantized latents for the generator. Behavioral spec from
reference src/hyperprior.py:142-330 (Hyperprior) and :340-458 (DLMM variant).

Entropy *coding* (the rANS round trip) lives host-side in
hific_tpu/entropy/; this module only owns the device math.
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from hific_tpu.models.density import (
    MIN_SCALE,
    HyperlatentDensity,
    dlmm_log_likelihood,
    latent_likelihood,
)
from hific_tpu.models.hyper import (
    HyperpriorAnalysis,
    HyperpriorSynthesis,
    HyperpriorSynthesisDLMM,
)
from hific_tpu.ops.maths import lower_bound_toward
from hific_tpu.ops.quantize import (
    estimate_entropy,
    estimate_entropy_log,
    quantize_noise,
    quantize_round,
    quantize_ste,
)

SMALL_HYPERLATENT_FILTERS = 192
LARGE_HYPERLATENT_FILTERS = 320


class HyperInfo(NamedTuple):
    decoded: jnp.ndarray          # STE-quantized latents fed to the generator
    latent_nbpp: jnp.ndarray      # noisy (differential) bpp, latents
    hyperlatent_nbpp: jnp.ndarray
    total_nbpp: jnp.ndarray
    latent_qbpp: jnp.ndarray      # quantized (Shannon) bpp
    hyperlatent_qbpp: jnp.ndarray
    total_qbpp: jnp.ndarray
    latent_means: jnp.ndarray     # (mu, sigma) for the entropy coder
    latent_scales: jnp.ndarray
    hyperlatents: jnp.ndarray     # pre-quantization hyperlatents


class Hyperprior(nn.Module):
    C: int = 220  # bottleneck capacity (latent channels)
    hyperlatent_filters: int = LARGE_HYPERLATENT_FILTERS
    likelihood_type: str = "gaussian"
    scale_lower_bound: float = MIN_SCALE
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.analysis_net = HyperpriorAnalysis(N=self.hyperlatent_filters,
                                               dtype=self.dtype)
        self.synthesis_mu = HyperpriorSynthesis(
            C=self.C, N=self.hyperlatent_filters, dtype=self.dtype)
        self.synthesis_std = HyperpriorSynthesis(
            C=self.C, N=self.hyperlatent_filters, dtype=self.dtype)
        self.hyperlatent_density = HyperlatentDensity(
            n_channels=self.hyperlatent_filters)

    def synthesize(self, hyperlatents_decoded):
        """(mu, sigma) of the conditional latent prior from (decoded)
        hyperlatents — shared by training forward, encoder and decoder sides
        of the codec (bit-exactness requirement, reference
        src/hyperprior.py:208-218 vs 256-265)."""
        mu = self.synthesis_mu(hyperlatents_decoded)
        scale = self.synthesis_std(hyperlatents_decoded)
        scale = lower_bound_toward(scale, self.scale_lower_bound)
        return mu, scale

    def analyze(self, latents):
        return self.analysis_net(latents)

    def hyperlatent_likelihood(self, z):
        return self.hyperlatent_density(z)

    def __call__(self, latents, spatial_shape, rng=None, training=True):
        """Training/validation forward. spatial_shape: (H, W) of the ORIGINAL
        image (bpp normalizer)."""
        if rng is None:
            rng = self.make_rng("quantize")
        rng_z, rng_y = jax.random.split(rng)

        hyperlatents = self.analysis_net(latents)

        noisy_hyper = quantize_noise(hyperlatents, rng_z)
        noisy_hyper_lik = self.hyperlatent_density(noisy_hyper)
        _, hyper_nbpp = estimate_entropy(noisy_hyper_lik, spatial_shape)

        quant_hyper = quantize_round(hyperlatents)
        quant_hyper_lik = self.hyperlatent_density(quant_hyper)
        _, hyper_qbpp = estimate_entropy(quant_hyper_lik, spatial_shape)

        hyperlatents_decoded = noisy_hyper if training else quant_hyper

        latent_means, latent_scales = self.synthesize(hyperlatents_decoded)

        noisy_latents = quantize_noise(latents, rng_y)
        noisy_lik = latent_likelihood(noisy_latents, latent_means, latent_scales,
                                      self.likelihood_type)
        _, latent_nbpp = estimate_entropy(noisy_lik, spatial_shape)

        quant_latents = quantize_round(latents, means=latent_means)
        quant_lik = latent_likelihood(quant_latents, latent_means, latent_scales,
                                      self.likelihood_type)
        _, latent_qbpp = estimate_entropy(quant_lik, spatial_shape)

        decoded = quantize_ste(latents, means=latent_means)

        return HyperInfo(
            decoded=decoded,
            latent_nbpp=latent_nbpp,
            hyperlatent_nbpp=hyper_nbpp,
            total_nbpp=latent_nbpp + hyper_nbpp,
            latent_qbpp=latent_qbpp,
            hyperlatent_qbpp=hyper_qbpp,
            total_qbpp=latent_qbpp + hyper_qbpp,
            latent_means=latent_means,
            latent_scales=latent_scales,
            hyperlatents=hyperlatents,
        )


class HyperpriorDLMM(nn.Module):
    """Discretized-logistic-mixture latent entropy model (training-only
    estimate; no compress path). Reference src/hyperprior.py:340-458."""

    C: int = 64
    hyperlatent_filters: int = LARGE_HYPERLATENT_FILTERS
    likelihood_type: str = "gaussian"
    mixture_components: int = 4
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        assert self.C <= 128, "DLMM capacity limited to 128 channels"
        self.analysis_net = HyperpriorAnalysis(N=self.hyperlatent_filters,
                                               dtype=self.dtype)
        self.synthesis_dlmm = HyperpriorSynthesisDLMM(
            C=self.C, N=self.hyperlatent_filters, dtype=self.dtype)
        self.hyperlatent_density = HyperlatentDensity(
            n_channels=self.hyperlatent_filters)

    def __call__(self, latents, spatial_shape, rng=None, training=True):
        if rng is None:
            rng = self.make_rng("quantize")
        rng_z, rng_y = jax.random.split(rng)

        hyperlatents = self.analysis_net(latents)

        noisy_hyper = quantize_noise(hyperlatents, rng_z)
        noisy_hyper_lik = self.hyperlatent_density(noisy_hyper)
        _, hyper_nbpp = estimate_entropy(noisy_hyper_lik, spatial_shape)

        quant_hyper = quantize_round(hyperlatents)
        quant_hyper_lik = self.hyperlatent_density(quant_hyper)
        _, hyper_qbpp = estimate_entropy(quant_hyper_lik, spatial_shape)

        hyperlatents_decoded = noisy_hyper if training else quant_hyper
        dlmm_params = self.synthesis_dlmm(hyperlatents_decoded)

        noisy_latents = quantize_noise(latents, rng_y)
        noisy_ll = dlmm_log_likelihood(noisy_latents, dlmm_params,
                                       self.likelihood_type)
        _, latent_nbpp = estimate_entropy_log(noisy_ll, spatial_shape)

        quant_latents = quantize_round(latents)
        quant_ll = dlmm_log_likelihood(quant_latents, dlmm_params,
                                       self.likelihood_type)
        _, latent_qbpp = estimate_entropy_log(quant_ll, spatial_shape)

        decoded = quantize_ste(latents) if training else quant_latents

        return HyperInfo(
            decoded=decoded,
            latent_nbpp=latent_nbpp,
            hyperlatent_nbpp=hyper_nbpp,
            total_nbpp=latent_nbpp + hyper_nbpp,
            latent_qbpp=latent_qbpp,
            hyperlatent_qbpp=hyper_qbpp,
            total_qbpp=latent_qbpp + hyper_qbpp,
            latent_means=jnp.zeros_like(decoded),
            latent_scales=jnp.ones_like(decoded),
            hyperlatents=hyperlatents,
        )
