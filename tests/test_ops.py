import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hific_tpu.ops import (
    asymmetric_pad_2x,
    channel_norm,
    estimate_entropy,
    lower_bound_identity,
    lower_bound_toward,
    pad_factor,
    pmf_to_quantized_cdf,
    quantize_noise,
    quantize_round,
    quantize_ste,
    reflect_pad,
    standardized_cdf_gaussian,
    standardized_cdf_logistic,
)


def test_lower_bound_identity_grad():
    f = lambda x: jnp.sum(lower_bound_identity(x, 1.0) ** 2)
    x = jnp.array([0.5, 2.0])
    g = jax.grad(f)(x)
    # value clamps, gradient passes through unchanged: d/dx (clamp(x)^2) = 2*clamp(x)
    np.testing.assert_allclose(g, [2.0 * 1.0, 2.0 * 2.0])


def test_lower_bound_toward_grad_gating():
    # Below bound: positive grad (pushing value down) blocked, negative passes.
    def loss_up(x):
        return jnp.sum(lower_bound_toward(x, 1.0))  # upstream grad +1

    def loss_down(x):
        return -jnp.sum(lower_bound_toward(x, 1.0))  # upstream grad -1

    x = jnp.array([0.5, 2.0])
    g_up = jax.grad(loss_up)(x)
    g_down = jax.grad(loss_down)(x)
    np.testing.assert_allclose(g_up, [0.0, 1.0])  # blocked below bound
    np.testing.assert_allclose(g_down, [-1.0, -1.0])  # passes everywhere


def test_standardized_cdfs():
    import scipy.stats

    x = np.linspace(-8, 8, 101).astype(np.float32)
    np.testing.assert_allclose(
        standardized_cdf_gaussian(jnp.array(x)), scipy.stats.norm.cdf(x), atol=1e-6
    )
    np.testing.assert_allclose(
        standardized_cdf_logistic(jnp.array(x)),
        scipy.stats.logistic.cdf(x),
        atol=1e-6,
    )


def test_pmf_to_quantized_cdf_matches_reference_semantics():
    rng = np.random.RandomState(0)
    for _ in range(20):
        n = rng.randint(2, 40)
        pmf = rng.rand(n).astype(np.float64)
        pmf /= pmf.sum()
        cdf = pmf_to_quantized_cdf(pmf, 16)
        assert cdf[0] == 0 and cdf[-1] == 1 << 16
        freqs = np.diff(cdf)
        assert np.all(freqs >= 1)  # no zero-frequency symbols
        # quantized pmf close to input
        np.testing.assert_allclose(freqs / (1 << 16), pmf, atol=2e-2)


def test_pmf_to_quantized_cdf_vs_torch_port():
    # Oracle: run the same algorithm in float32 torch semantics on a case with
    # an underflowing symbol.
    pmf = np.array([0.5, 1e-9, 0.3, 0.2 - 1e-9])
    cdf = pmf_to_quantized_cdf(pmf, 12)
    freqs = np.diff(cdf)
    assert freqs[1] >= 1
    assert freqs.sum() == 1 << 12


def test_reflect_pads():
    x = jnp.arange(2 * 4 * 5 * 3, dtype=jnp.float32).reshape(2, 4, 5, 3)
    y = reflect_pad(x, 2)
    assert y.shape == (2, 8, 9, 3)
    # reflect property: row pad mirrors without repeating edge
    np.testing.assert_allclose(y[:, 0], y[:, 4])
    z = asymmetric_pad_2x(x)
    assert z.shape == (2, 5, 6, 3)
    np.testing.assert_allclose(z[:, 0], z[:, 2])  # top pad = reflection
    np.testing.assert_allclose(z[:, :, -1], z[:, :, -3])  # right pad


def test_pad_factor():
    x = jnp.ones((1, 126, 95, 4))
    y = pad_factor(x, 16)
    assert y.shape == (1, 128, 96, 4)
    y2 = pad_factor(y, 16)
    assert y2.shape == y.shape  # no-op when already multiple


def test_quantizers():
    x = jnp.array([[-1.2, -0.5, 0.49, 2.5]])
    np.testing.assert_allclose(quantize_round(x), np.floor(np.asarray(x) + 0.5))
    means = jnp.full_like(x, 0.3)
    np.testing.assert_allclose(
        quantize_round(x, means), np.floor(np.asarray(x) - 0.3 + 0.5) + 0.3, atol=1e-6
    )
    # STE: forward equals round, grad identity
    np.testing.assert_allclose(quantize_ste(x, means), quantize_round(x, means), atol=1e-6)
    g = jax.grad(lambda v: jnp.sum(quantize_ste(v) ** 2))(x)
    np.testing.assert_allclose(g, 2 * quantize_round(x), atol=1e-6)

    rng = jax.random.PRNGKey(0)
    xn = quantize_noise(jnp.zeros((1000,)), rng)
    assert float(jnp.max(jnp.abs(xn))) <= 0.5
    assert abs(float(jnp.mean(xn))) < 0.05


def test_estimate_entropy_normalization():
    # likelihood 0.5 for every element -> 1 bit per element
    lik = jnp.full((2, 4, 8, 8), 0.5)
    n_bits, bpp = estimate_entropy(lik, (16, 16))
    np.testing.assert_allclose(n_bits, 4 * 8 * 8, rtol=1e-5)
    np.testing.assert_allclose(bpp, 4 * 8 * 8 / 256.0, rtol=1e-5)


def test_channel_norm_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.random.RandomState(1).randn(2, 6, 5, 7).astype(np.float32)  # NCHW
    gamma = np.random.RandomState(2).randn(6).astype(np.float32)
    beta = np.random.RandomState(3).randn(6).astype(np.float32)

    xt = torch.tensor(x)
    mu = xt.mean(dim=1, keepdim=True)
    var = xt.var(dim=1, keepdim=True)  # unbiased
    ref = (xt - mu) * torch.rsqrt(var + 1e-3)
    ref = gamma.reshape(1, 6, 1, 1) * ref.numpy() + beta.reshape(1, 6, 1, 1)

    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    out = channel_norm(x_nhwc, jnp.asarray(gamma), jnp.asarray(beta))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-5)
