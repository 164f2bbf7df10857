"""Mathematical primitives with custom VJPs.

TPU-native equivalents of the reference's autograd helpers
(reference: src/helpers/maths.py:76-121). Implemented as `jax.custom_vjp`
functions so the clamping semantics survive `jit`/`grad`/`vmap`.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def lower_bound_identity(x, bound):
    """Clamp to `bound` from below; gradient passes through unchanged.

    Reference: src/helpers/maths.py:76-84 (LowerBoundIdentity).
    """
    return jnp.maximum(x, bound)


def _lbi_fwd(x, bound):
    return jnp.maximum(x, bound), None


def _lbi_bwd(bound, res, g):
    del bound, res
    return (g,)


lower_bound_identity.defvjp(_lbi_fwd, _lbi_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def lower_bound_toward(x, bound):
    """Clamp to `bound` from below; gradient passes only where the input is
    above the bound OR the gradient pushes the value up toward the bound.

    Reference: src/helpers/maths.py:87-100 (LowerBoundToward).
    """
    return jnp.maximum(x, bound)


def _lbt_fwd(x, bound):
    return jnp.maximum(x, bound), (x >= bound)


def _lbt_bwd(bound, mask, g):
    del bound
    # Pass gradient if above bound, or if gradient is negative (for a
    # minimization step -g pushes the value up).
    gate = jnp.logical_or(mask, g < 0.0).astype(g.dtype)
    return (g * gate,)


lower_bound_toward.defvjp(_lbt_fwd, _lbt_bwd)


_INV_SQRT2 = 1.0 / np.sqrt(2.0)


def standardized_cdf_gaussian(value):
    """CDF of the standard Gaussian, erfc form for left-tail stability.

    Reference: src/helpers/maths.py:102-105.
    """
    return 0.5 * jax.lax.erfc(value * (-_INV_SQRT2))


def standardized_cdf_logistic(value):
    """CDF of the standard logistic distribution (sigmoid).

    Reference: src/helpers/maths.py:107-109.
    """
    return jax.nn.sigmoid(value)


def standardized_quantile_gaussian(quantile):
    return scipy.stats.norm.ppf(quantile)


def standardized_quantile_logistic(quantile):
    return scipy.stats.logistic.ppf(quantile)


def quantile_gaussian(quantile, mean, scale):
    return scipy.stats.norm.ppf(quantile, loc=mean, scale=scale)


def quantile_logistic(quantile, mean, scale):
    return scipy.stats.logistic.ppf(quantile, loc=mean, scale=scale)


def pmf_to_quantized_cdf(pmf, precision):
    """Quantize a PMF to an integer CDF summing exactly to 2**precision.

    Host-side (numpy) port of the ryg_rans-style normalization used by the
    reference (src/helpers/maths.py:5-73 and the vestigial C++ kernel
    src/helpers/pmf.cc). If quantization zeroes a nonzero-probability symbol,
    frequency is stolen from the currently-smallest (>1) symbol.

    Args:
        pmf: 1-D array of non-negative floats (need not be normalized).
        precision: target bit precision; CDF sums to 1 << precision.

    Returns:
        int32 numpy array of length len(pmf)+1, cdf[0] == 0,
        cdf[-1] == 1 << precision, monotone non-decreasing.
    """
    pmf = np.asarray(pmf, dtype=np.float64)
    assert precision >= 8, "precision should be in [8, 32]"
    assert pmf.ndim == 1 and pmf.shape[0] >= 2
    assert np.all(pmf >= 0.0), "PMF must be non-negative"
    assert not np.any(np.isnan(pmf)), "PMF contains NaNs"

    target_total = 1 << precision
    cdf = np.zeros(pmf.shape[0] + 1, dtype=np.float64)
    cdf[1:] = np.cumsum(pmf)
    empirical_total = cdf[-1]
    cdf = np.round(cdf * target_total / empirical_total).astype(np.int64)

    for i in range(len(cdf) - 1):
        if cdf[i] == cdf[i + 1]:
            # Steal frequency from the lowest-frequency symbol with freq > 1.
            freqs = cdf[1:] - cdf[:-1]
            candidates = np.where(freqs > 1)[0]
            assert candidates.size > 0, "no frequency available to steal"
            best_steal = candidates[np.argmin(freqs[candidates])]
            if best_steal < i:
                cdf[best_steal + 1 : i + 1] -= 1
            else:
                assert best_steal > i
                cdf[i + 1 : best_steal + 1] += 1

    assert cdf[0] == 0 and cdf[-1] == target_total, "CDF normalization error"
    assert np.all(np.diff(cdf) >= 0), "CDF not monotone"
    return cdf.astype(np.int32)
