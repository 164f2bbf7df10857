import jax
import jax.numpy as jnp
import numpy as np

from hific_tpu.models import (
    Discriminator,
    Encoder,
    Generator,
    HyperpriorAnalysis,
    HyperpriorSynthesis,
    HyperpriorSynthesisDLMM,
)


def test_encoder_shapes():
    enc = Encoder(C=8)
    x = jnp.zeros((2, 64, 64, 3))
    params = enc.init(jax.random.PRNGKey(0), x)
    y = enc.apply(params, x)
    assert y.shape == (2, 4, 4, 8)


def test_encoder_arbitrary_multiple_of_16():
    enc = Encoder(C=4)
    x = jnp.zeros((1, 64, 96, 3))
    params = enc.init(jax.random.PRNGKey(0), x)
    y = enc.apply(params, x)
    assert y.shape == (1, 4, 6, 4)


def test_generator_shapes():
    gen = Generator(C=8, n_residual_blocks=2)
    y = jnp.zeros((2, 4, 4, 8))
    params = gen.init(jax.random.PRNGKey(0), y)
    x = gen.apply(params, y)
    assert x.shape == (2, 64, 64, 3)


def test_generator_noise():
    gen = Generator(C=8, n_residual_blocks=1, sample_noise=True, noise_dim=4)
    y = jnp.zeros((1, 4, 4, 8))
    params = gen.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, y)
    x = gen.apply(params, y, rngs={"noise": jax.random.PRNGKey(2)})
    assert x.shape == (1, 64, 64, 3)


def test_hyper_shapes():
    ha = HyperpriorAnalysis(N=32)
    y = jnp.zeros((2, 16, 16, 8))
    pa = ha.init(jax.random.PRNGKey(0), y)
    z = ha.apply(pa, y)
    assert z.shape == (2, 4, 4, 32)

    hs = HyperpriorSynthesis(C=8, N=32)
    ps = hs.init(jax.random.PRNGKey(0), z)
    mu = hs.apply(ps, z)
    assert mu.shape == (2, 16, 16, 8)

    hd = HyperpriorSynthesisDLMM(C=8, N=32)
    pd = hd.init(jax.random.PRNGKey(0), z)
    out = hd.apply(pd, z)
    assert out.shape == (2, 16, 16, 8 * 4 * 3)


def test_hyper_odd_shapes():
    # hyper nets should round-trip shapes for any multiple-of-4 input
    ha = HyperpriorAnalysis(N=16)
    hs = HyperpriorSynthesis(C=8, N=16)
    y = jnp.zeros((1, 12, 20, 8))
    z = ha.apply(ha.init(jax.random.PRNGKey(0), y), y)
    assert z.shape == (1, 3, 5, 16)
    mu = hs.apply(hs.init(jax.random.PRNGKey(0), z), z)
    assert mu.shape == (1, 12, 20, 8)


def test_discriminator_shapes_and_sn():
    disc = Discriminator()
    x = jnp.zeros((4, 64, 64, 3))  # cat of 2 real + 2 gen
    y = jnp.zeros((4, 4, 4, 8))
    variables = disc.init(jax.random.PRNGKey(0), x, y)
    (out, logits), mutated = disc.apply(
        variables, x, y, update_stats=True, mutable=["spectral"]
    )
    assert out.shape == (4 * 4 * 4, 1)
    assert logits.shape == (4 * 4 * 4, 1)
    assert np.all(np.asarray(out) >= 0) and np.all(np.asarray(out) <= 1)
    # power iteration state updated
    u_before = variables["spectral"]["conv1"]["u"]
    u_after = mutated["spectral"]["conv1"]["u"]
    assert not np.allclose(u_before, u_after)


def test_spectral_norm_scales_to_unit_norm():
    from hific_tpu.models.layers import SNConv

    m = SNConv(4, 3, stride=1, padding=1)
    x = jnp.ones((1, 8, 8, 2))
    variables = m.init(jax.random.PRNGKey(0), x)
    # run many power iterations to converge u
    for _ in range(50):
        _, variables_new = m.apply(variables, x, update_stats=True, mutable=["spectral"])
        variables = {**variables, "spectral": variables_new["spectral"]}
    kernel = variables["params"]["kernel"]
    w = np.asarray(kernel).transpose(3, 2, 0, 1).reshape(4, -1)
    sigma_true = np.linalg.svd(w, compute_uv=False)[0]
    u = np.asarray(variables["spectral"]["u"])
    v = w.T @ u
    v /= np.linalg.norm(v)
    u2 = w @ v
    u2 /= np.linalg.norm(u2)
    sigma_est = u2 @ (w @ v)
    np.testing.assert_allclose(sigma_est, sigma_true, rtol=1e-3)
