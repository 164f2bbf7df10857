"""Eval-mode Hyperprior parity vs the reference: with converted weights, the
deterministic quantities (latent means/scales, quantized bpps, STE-decoded
latents) must match. The noisy (training) paths draw platform RNG and are
compared statistically elsewhere.
"""

import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "src")),
    reason="reference tree not mounted")

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_hyperprior_module():
    for name, attrs in [
        ("autograd", {"numpy": np, "make_vjp": None}),
        ("autograd.extend", {"vspace": None, "VSpace": object}),
        ("torchvision", {}),
        ("torchvision.utils", {"save_image": None}),
    ]:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(mod, k, v)
            sys.modules[name] = mod
    sys.modules["autograd"].extend = sys.modules["autograd.extend"]
    sys.modules.setdefault("autograd.numpy", np)
    sys.modules["torchvision"].utils = sys.modules["torchvision.utils"]
    sys.path.insert(0, REFERENCE)
    try:
        from src import hyperprior as r_hyperprior
    finally:
        sys.path.remove(REFERENCE)
    return r_hyperprior


def test_hyperprior_eval_forward_parity(ref_hyperprior_module):
    import jax
    import jax.numpy as jnp

    from hific_tpu.models.hyperprior import Hyperprior
    from hific_tpu.utils.convert_torch import _conv, _convT, _set

    torch.manual_seed(0)
    C, N = 6, 8
    r_hp = ref_hyperprior_module.Hyperprior(bottleneck_capacity=C,
                                            hyperlatent_filters=N)
    r_hp.eval()

    y = torch.randn(2, C, 8, 8) * 3
    spatial = (128, 128)
    with torch.no_grad():
        info = r_hp(y, spatial_shape=spatial)
        # deterministic pieces recomputed explicitly (the reference's
        # forward mixes in noisy-path randomness)
        z = r_hp.analysis_net(y)
        z_q = torch.floor(z + 0.5)
        mu = r_hp.synthesis_mu(z_q)
        want_decoded = info.decoded.numpy()
        want_qbpp = float(info.total_qbpp)
        want_mu = mu.numpy()

    sd = r_hp.state_dict()
    p = {}
    for i in (1, 2, 3):
        _set(p, f"analysis_net/conv{i}/Conv_0/kernel",
             _conv(sd[f"analysis_net.conv{i}.weight"]))
        _set(p, f"analysis_net/conv{i}/Conv_0/bias",
             sd[f"analysis_net.conv{i}.bias"])
    for net in ("synthesis_mu", "synthesis_std"):
        for i in (1, 2):
            _set(p, f"{net}/conv{i}/kernel", _convT(sd[f"{net}.conv{i}.weight"]))
            _set(p, f"{net}/conv{i}/bias", sd[f"{net}.conv{i}.bias"])
        # stride-1 ConvTranspose2d == conv with flipped kernel (hyper.py:85)
        _set(p, f"{net}/conv3/Conv_0/kernel", _convT(sd[f"{net}.conv3.weight"]))
        _set(p, f"{net}/conv3/Conv_0/bias", sd[f"{net}.conv3.bias"])
    for k in range(4):
        _set(p, f"hyperlatent_density/H_{k}",
             sd[f"hyperlatent_likelihood.H_{k}"])
        _set(p, f"hyperlatent_density/a_{k}",
             sd[f"hyperlatent_likelihood.a_{k}"])
        _set(p, f"hyperlatent_density/b_{k}",
             sd[f"hyperlatent_likelihood.b_{k}"])

    hp = Hyperprior(C=C, hyperlatent_filters=N)
    y_nhwc = jnp.asarray(y.numpy().transpose(0, 2, 3, 1))
    got = hp.apply({"params": p}, y_nhwc, spatial, training=False,
                   rngs={"quantize": jax.random.PRNGKey(0)})

    np.testing.assert_allclose(
        np.asarray(got.decoded).transpose(0, 3, 1, 2), want_decoded,
        atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(got.latent_means).transpose(0, 3, 1, 2), want_mu,
        atol=2e-4)
    np.testing.assert_allclose(float(got.total_qbpp), want_qbpp, rtol=1e-3)


def test_hyperprior_dlmm_converted_parity(ref_hyperprior_module):
    """DLMM variant through convert_state_dict: the synthesis head's
    mixture parameters and the discretized logistic-mixture log-likelihood
    match the reference (hyperprior.py:381-402)."""
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, REFERENCE)
    try:
        from src.network import encoder as r_encoder
        from src.network import generator as r_generator
    finally:
        sys.path.remove(REFERENCE)

    from hific_tpu.models.density import dlmm_log_likelihood
    from hific_tpu.models.hyperprior import HyperpriorDLMM
    from hific_tpu.utils.convert_torch import convert_state_dict

    torch.manual_seed(9)
    C, N = 4, 8
    r_enc = r_encoder.Encoder(image_dims=(3, 64, 64), batch_size=1, C=C)
    r_gen = r_generator.Generator(input_dims=(C, 4, 4), batch_size=1, C=C,
                                  n_residual_blocks=1)
    r_dlmm = ref_hyperprior_module.HyperpriorDLMM(
        bottleneck_capacity=C, hyperlatent_filters=N, mixture_components=4)
    r_dlmm.eval()

    sd = {}
    for prefix, mod in [("Encoder", r_enc), ("Generator", r_gen),
                        ("Hyperprior", r_dlmm)]:
        sd.update({f"{prefix}.{k}": v.detach().clone()
                   for k, v in mod.state_dict().items()})
    params, _, _ = convert_state_dict(sd, n_residual_blocks=1)
    hp = params["hyperprior"]
    assert "synthesis_dlmm" in hp and "synthesis_mu" not in hp

    y = torch.randn(1, C, 8, 8) * 2
    with torch.no_grad():
        z_q = torch.floor(r_dlmm.analysis_net(y) + 0.5)
        want_params = r_dlmm.synthesis_DLMM_params(z_q).numpy()
        y_q = torch.floor(y + 0.5)
        want_ll = r_dlmm.latent_log_likelihood_DLMM(y_q, torch.from_numpy(
            want_params)).numpy()

    m = HyperpriorDLMM(C=C, hyperlatent_filters=N)
    z_nhwc = jnp.asarray(z_q.numpy().transpose(0, 2, 3, 1))
    got_params = m.apply({"params": hp}, z_nhwc,
                         method=lambda self, t: self.synthesis_dlmm(t))
    # ours emits NHWC with channel blocks (3, C, K); reference NCHW blocks
    got_nchw = np.asarray(got_params).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got_nchw, want_params, atol=2e-4)

    got_ll = dlmm_log_likelihood(
        jnp.asarray(y_q.numpy().transpose(0, 2, 3, 1)), got_params)
    np.testing.assert_allclose(
        np.asarray(got_ll).transpose(0, 3, 1, 2), want_ll, atol=1e-4)
