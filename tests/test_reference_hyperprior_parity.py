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
