"""Fused ChannelNorm Pallas kernel: parity with the reference math in
interpret mode, forward and backward."""

import jax
import jax.numpy as jnp
import numpy as np

from hific_tpu.ops.channel_norm import channel_norm
from hific_tpu.ops.pallas_norm import channel_norm_fused


def _data(m=70, c=24, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(2, 5, 7, c).astype(np.float32))
    gamma = jnp.asarray(rng.randn(c).astype(np.float32))
    beta = jnp.asarray(rng.randn(c).astype(np.float32))
    return x, gamma, beta


def test_fused_forward_matches_plain():
    x, gamma, beta = _data()
    want = channel_norm(x, gamma, beta)
    got = channel_norm_fused(x, gamma, beta, act="none")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    want_relu = jax.nn.relu(want)
    got_relu = channel_norm_fused(x, gamma, beta, act="relu")
    np.testing.assert_allclose(np.asarray(got_relu), np.asarray(want_relu),
                               atol=1e-5)


def test_fused_backward_matches_plain():
    x, gamma, beta = _data(seed=1)

    def loss_plain(x, g, b):
        return jnp.sum(jax.nn.relu(channel_norm(x, g, b)) ** 2)

    def loss_fused(x, g, b):
        return jnp.sum(channel_norm_fused(x, g, b, act="relu") ** 2)

    g_plain = jax.grad(loss_plain, argnums=(0, 1, 2))(x, gamma, beta)
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b in zip(g_plain, g_fused):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_model_with_pallas_norm_matches_xla():
    """Whole tiny model forward identical with either norm backend."""
    from hific_tpu.config import mse_lpips_config
    from hific_tpu.models.hific import HiFiC

    kw = dict(latent_channels=8, n_residual_blocks=1, hyperlatent_filters=16)
    cfg_x = mse_lpips_config(**kw, use_pallas_norm=False)
    cfg_p = mse_lpips_config(**kw, use_pallas_norm=True)
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)

    m_x, m_p = HiFiC(cfg_x), HiFiC(cfg_p)
    variables = m_x.init({"params": rng, "quantize": rng}, x, training=True)
    out_x, _ = m_x.apply(variables, x, training=False,
                         rngs={"quantize": jax.random.PRNGKey(1)})
    out_p, _ = m_p.apply(variables, x, training=False,
                         rngs={"quantize": jax.random.PRNGKey(1)})
    np.testing.assert_allclose(np.asarray(out_x.reconstruction),
                               np.asarray(out_p.reconstruction), atol=1e-4)
