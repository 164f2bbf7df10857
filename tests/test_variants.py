"""Model-family variants: DLMM latent entropy model, logistic likelihood,
noise-sampling generator, instance norm — each trains end to end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from hific_tpu.config import hific_config, mse_lpips_config
from hific_tpu.training.train_step import create_train_state, make_train_step_g

TINY = dict(
    latent_channels=8,
    n_residual_blocks=1,
    hyperlatent_filters=16,
    crop_size=64,
    batch_size=2,
)


def _run_steps(cfg, n=2):
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step_g(cfg))
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    for _ in range(n):
        state, diag = step(state, x)
    assert np.isfinite(float(diag["weighted_compression_loss"]))
    return state, diag


def test_dlmm_variant_trains():
    cfg = mse_lpips_config(**{**TINY, "use_latent_mixture_model": True,
                              "latent_channels_dlmm": 8})
    state, diag = _run_steps(cfg)
    assert float(diag["q_rate"]) > 0


def test_logistic_likelihood_trains():
    cfg = mse_lpips_config(**TINY, likelihood_type="logistic")
    _run_steps(cfg)


def test_logistic_codec_roundtrip():
    from hific_tpu.codec import Codec
    from hific_tpu.models.hific import HiFiC

    cfg = mse_lpips_config(**TINY, likelihood_type="logistic")
    model = HiFiC(cfg)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "quantize": rng},
                           jnp.zeros((1, 64, 64, 3)), training=True)
    codec = Codec(cfg, variables["params"])
    x = np.random.RandomState(1).rand(1, 64, 64, 3).astype(np.float32)
    out = codec.compress(x)
    recon = codec.decompress(out)
    assert recon.shape == (1, 64, 64, 3)
    assert out.total_bpp > 0


def test_noise_sampling_generator_trains():
    cfg = hific_config(**TINY, sample_noise=True, noise_dim=4)
    _run_steps(cfg)


def test_instance_norm_variant_trains():
    cfg = mse_lpips_config(**TINY, use_channel_norm=False)
    _run_steps(cfg)


def test_lpips_architecture_and_grads():
    """LPIPS forward shape and gradient flow through to the input (its own
    params must stay out of the optimizer)."""
    from hific_tpu.models.lpips import LPIPS

    lpips = LPIPS(net="alex")
    rng = jax.random.PRNGKey(0)
    a = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    b = jnp.asarray(np.random.RandomState(1).rand(2, 64, 64, 3), jnp.float32)
    variables = lpips.init(rng, a, b)
    d = lpips.apply(variables, a, b, normalize=True)
    assert d.shape == (2, 1, 1, 1)
    assert float(jnp.mean(lpips.apply(variables, a, a, normalize=True))) < 1e-6

    g = jax.grad(lambda x: jnp.sum(lpips.apply(variables, x, b,
                                               normalize=True)))(a)
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).max() > 0


def test_lpips_vgg_variant():
    from hific_tpu.models.lpips import LPIPS

    lpips = LPIPS(net="vgg")
    a = jnp.zeros((1, 64, 64, 3))
    variables = lpips.init(jax.random.PRNGKey(0), a, a)
    d = lpips.apply(variables, a, a)
    assert d.shape == (1, 1, 1, 1)


def test_lpips_torch_lin_weight_loader(tmp_path):
    """Round-trip the lin-head loader with a synthetic torch checkpoint."""
    torch = pytest.importorskip("torch")
    from hific_tpu.models.lpips import ALEX_CHNS, LPIPS, load_torch_lpips_weights

    lin_sd = {}
    rng = np.random.RandomState(0)
    for k, c in enumerate(ALEX_CHNS):
        lin_sd[f"lin{k}.model.1.weight"] = torch.tensor(
            np.abs(rng.randn(1, c, 1, 1)).astype(np.float32))
    path = str(tmp_path / "alex_lin.pth")
    torch.save(lin_sd, path)

    lpips = LPIPS(net="alex")
    a = jnp.zeros((1, 64, 64, 3))
    params = lpips.init(jax.random.PRNGKey(0), a, a)["params"]
    loaded = load_torch_lpips_weights(params, path)
    for k, c in enumerate(ALEX_CHNS):
        np.testing.assert_allclose(
            np.asarray(loaded[f"lin{k}"]),
            lin_sd[f"lin{k}.model.1.weight"].numpy().reshape(-1))
