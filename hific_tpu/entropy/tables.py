"""Probability-table construction for the entropy coders.

- `estimate_tails`: vectorized Adam search for CDF quantiles, expressed as a
  bounded `lax.while_loop` under jit (the reference runs a Python loop of
  torch backward passes, compression_utils.py:30-80).
- `build_factorized_tables`: per-channel quantized CDFs for the learned
  hyperlatent density (reference hyperprior_model.py:42-105).
- `build_scale_tables`: one CDF row per entry of the log-spaced scale table
  for the conditional latent prior (reference prior_model.py:20-26, 77-120).
"""

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from hific_tpu.models.density import PRECISION_P, TAIL_MASS
from hific_tpu.ops.maths import pmf_to_quantized_cdf

SCALES_MIN = 0.11
SCALES_MAX = 256.0
SCALES_LEVELS = 64


class CdfTables(NamedTuple):
    """Quantized-CDF bundle consumed by the indexed rANS coder."""

    cdf: np.ndarray          # uint32 [n_rows, max_length + 2]
    cdf_length: np.ndarray   # int32 [n_rows]
    cdf_offset: np.ndarray   # int32 [n_rows]
    inverse: np.ndarray      # int32 [n_rows, 2**precision] cf -> symbol
    precision: int


def prior_scale_table(scales_min=SCALES_MIN, scales_max=SCALES_MAX,
                      levels=SCALES_LEVELS) -> np.ndarray:
    """Log-spaced static scale table (reference prior_model.py:24-26)."""
    return np.exp(np.linspace(np.log(scales_min), np.log(scales_max), levels))


def estimate_tails(cdf_fn: Callable, target, shape, max_iters=200_000,
                   extra_counts=24):
    """Find x with cdf_fn(x) == target by vectorized Adam, jitted.

    Runs until every lane has overshot the optimum for `extra_counts`
    consecutive-ish iterations — the reference's convergence rule
    (compression_utils.py:30-80, which iterates UNBOUNDED; max_iters here
    is only a runaway backstop, far above any real convergence: Adam at
    lr=1e-2 moves ~1e-2/step, and even tails at |x|~100 need ~1e4 steps.
    An early cap silently truncates the coder's tail support and bloats
    overflow escapes). cdf_fn must be monotone and jax-differentiable.
    """
    target = jnp.asarray(target, jnp.float32)
    lr, eps = 1e-2, 1e-8
    beta_1, beta_2 = 0.9, 0.99

    def loss_grad(tails):
        def f(t):
            return jnp.sum(jnp.abs(cdf_fn(t) - target))
        return jax.grad(f)(tails)

    def cond(state):
        i, tails, m, v, counts = state
        return jnp.logical_and(i < max_iters, jnp.min(counts) < extra_counts)

    def body(state):
        i, tails, m, v, counts = state
        tgrad = loss_grad(tails)
        m = beta_1 * m + (1.0 - beta_1) * tgrad
        v = beta_2 * v + (1.0 - beta_2) * jnp.square(tgrad)
        tails = tails - lr * m / (jnp.sqrt(v) + eps)
        counts = jnp.where(
            jnp.logical_or(counts > 0, tgrad * tails > 0), counts + 1, counts)
        return i + 1, tails, m, v, counts

    init = (
        jnp.zeros((), jnp.int32),
        jnp.zeros(shape, jnp.float32),
        jnp.zeros(shape, jnp.float32),
        jnp.ones(shape, jnp.float32),
        jnp.zeros(shape, jnp.int32),
    )
    _, tails, _, _, _ = jax.lax.while_loop(cond, body, init)
    return tails


def _quantize_rows(pmf: np.ndarray, pmf_length: np.ndarray,
                   overflow: np.ndarray, precision: int):
    """Quantize per-row float pmfs (+ explicit overflow mass) to CDF rows."""
    n_rows = pmf.shape[0]
    max_length = int(pmf_length.max())
    cdf = np.zeros((n_rows, max_length + 2), dtype=np.uint32)
    for r in range(n_rows):
        p = np.concatenate([pmf[r, : pmf_length[r]], [overflow[r]]])
        q = pmf_to_quantized_cdf(np.maximum(p, 0.0), precision)
        cdf[r, : len(q)] = q.astype(np.uint32)
    return cdf


def build_factorized_tables(likelihood_fn: Callable, lower_tail, upper_tail,
                            precision=PRECISION_P) -> CdfTables:
    """Tables for the learned factorized (hyperlatent) density.

    likelihood_fn: maps samples of shape (C, 1, M) -> likelihoods (C, 1, M)
        (the HyperlatentDensity collapsed-format likelihood).
    lower_tail/upper_tail: per-channel quantile estimates (C,).
    """
    lower_tail = np.asarray(lower_tail, np.float64)
    upper_tail = np.asarray(upper_tail, np.float64)
    n_channels = lower_tail.shape[0]

    minima = np.clip(np.ceil(-lower_tail), 0, None).astype(np.int32)
    maxima = np.clip(np.ceil(upper_tail), 0, None).astype(np.int32)
    pmf_start = (-minima).astype(np.float64)
    pmf_length = (maxima + minima + 1).astype(np.int32)
    max_length = int(pmf_length.max())

    samples = pmf_start[:, None] + np.arange(max_length)[None, :]
    pmf = np.asarray(
        likelihood_fn(jnp.asarray(samples[:, None, :], jnp.float32)),
        np.float64)[:, 0, :]

    # Mask samples beyond each channel's pmf_length, then put the leftover
    # mass in the overflow slot.
    valid = np.arange(max_length)[None, :] < pmf_length[:, None]
    pmf = np.where(valid, pmf, 0.0)
    overflow = np.clip(1.0 - pmf.sum(axis=1), 0.0, None)

    cdf = _quantize_rows(pmf, pmf_length, overflow, precision)
    cdf_length = (pmf_length + 2).astype(np.int32)
    cdf_offset = (-minima).astype(np.int32)
    from hific_tpu.entropy.coding import build_inverse_table

    return CdfTables(cdf, cdf_length, cdf_offset,
                     build_inverse_table(cdf, cdf_length, precision), precision)


def build_scale_tables(standardized_cdf: Callable,
                       standardized_quantile: Callable,
                       scale_table=None, tail_mass=TAIL_MASS,
                       precision=PRECISION_P) -> CdfTables:
    """Tables for the mean-scale conditional prior: one row per table scale,
    symmetric pmf around 0, closed-form tails."""
    if scale_table is None:
        scale_table = prior_scale_table()
    scale_table = np.maximum(np.asarray(scale_table, np.float64), SCALES_MIN)

    multiplier = -standardized_quantile(tail_mass / 2)
    pmf_center = np.ceil(scale_table * multiplier).astype(np.int32)
    pmf_length = (2 * pmf_center + 1).astype(np.int32)
    max_length = int(pmf_length.max())

    samples = np.abs(np.arange(max_length)[None, :] - pmf_center[:, None])
    samples_scale = scale_table[:, None]
    upper = np.asarray(standardized_cdf(
        jnp.asarray((0.5 - samples) / samples_scale, jnp.float32)), np.float64)
    lower = np.asarray(standardized_cdf(
        jnp.asarray((-0.5 - samples) / samples_scale, jnp.float32)), np.float64)
    pmf = upper - lower

    # Overflow slot gets the two-sided tail mass (reference
    # prior_model.py:92,104 uses 2 * lower[:, :1]).
    overflow = 2.0 * lower[:, 0]
    valid = np.arange(max_length)[None, :] < pmf_length[:, None]
    pmf = np.where(valid, pmf, 0.0)

    cdf = _quantize_rows(pmf, pmf_length, overflow, precision)
    cdf_length = (pmf_length + 2).astype(np.int32)
    cdf_offset = (-pmf_center).astype(np.int32)
    from hific_tpu.entropy.coding import build_inverse_table

    return CdfTables(cdf, cdf_length, cdf_offset,
                     build_inverse_table(cdf, cdf_length, precision), precision)


def compute_scale_indices(scales: np.ndarray, scale_table: np.ndarray
                          ) -> np.ndarray:
    """Index of the smallest table scale >= predicted scale (reference
    prior_model.py:148-156): count of strictly-smaller table entries."""
    scales = np.maximum(np.asarray(scales), SCALES_MIN)
    indices = np.full(scales.shape, len(scale_table) - 1, np.int32)
    for s in scale_table[:-1]:
        indices -= (scales <= s).astype(np.int32)
    return indices
