"""Numerical parity of our NHWC transforms against the reference torch
modules, through the checkpoint converter. This is the machinery that makes
pretrained HIFIC checkpoints usable: if these pass, a converted reference
checkpoint computes the same function here.

Small channel counts keep the CPU runtime sane; the architecture is
identical up to widths.
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
def ref():
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
        from src.network import encoder as r_encoder
        from src.network import generator as r_generator
        from src.compression import hyperprior_model as r_hyperprior_model
    finally:
        sys.path.remove(REFERENCE)
    return types.SimpleNamespace(encoder=r_encoder, generator=r_generator,
                                 hyperprior_model=r_hyperprior_model)


def _state_dict_with_prefix(module, prefix):
    return {f"{prefix}.{k}": v for k, v in module.state_dict().items()}


def test_encoder_full_stack_parity(ref):
    import jax.numpy as jnp

    from hific_tpu.models.encoder import Encoder
    from hific_tpu.utils.convert_torch import convert_state_dict

    torch.manual_seed(0)
    C = 4
    r_enc = ref.encoder.Encoder(image_dims=(3, 64, 64), batch_size=1, C=C)
    r_enc.eval()
    x = torch.rand(1, 3, 64, 64)
    with torch.no_grad():
        want = r_enc(x).numpy()

    sd = _state_dict_with_prefix(r_enc, "Encoder")
    # converter needs only encoder keys for this test
    params = {}
    from hific_tpu.utils.convert_torch import _conv, _norm, _set

    _set(params, "conv_stem/Conv_0/kernel", _conv(sd["Encoder.conv_block1.1.weight"]))
    _set(params, "conv_stem/Conv_0/bias", sd["Encoder.conv_block1.1.bias"])
    _set(params, "norm_stem/gamma", _norm(sd["Encoder.conv_block1.2.gamma"]))
    _set(params, "norm_stem/beta", _norm(sd["Encoder.conv_block1.2.beta"]))
    for i in range(4):
        pre = f"Encoder.conv_block{i + 2}"
        _set(params, f"conv_down{i}/Conv_0/kernel", _conv(sd[f"{pre}.1.weight"]))
        _set(params, f"conv_down{i}/Conv_0/bias", sd[f"{pre}.1.bias"])
        _set(params, f"norm_down{i}/gamma", _norm(sd[f"{pre}.2.gamma"]))
        _set(params, f"norm_down{i}/beta", _norm(sd[f"{pre}.2.beta"]))
    _set(params, "conv_out/Conv_0/kernel", _conv(sd["Encoder.conv_block_out.1.weight"]))
    _set(params, "conv_out/Conv_0/bias", sd["Encoder.conv_block_out.1.bias"])

    enc = Encoder(C=C)
    got = enc.apply({"params": params},
                    jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               atol=2e-4)


def test_generator_full_stack_parity(ref):
    import jax.numpy as jnp

    from hific_tpu.models.generator import Generator
    from hific_tpu.utils.convert_torch import _conv, _convT, _norm, _set

    torch.manual_seed(1)
    C, n_res = 4, 2
    r_gen = ref.generator.Generator(input_dims=(C, 8, 8), batch_size=1, C=C,
                                    n_residual_blocks=n_res)
    r_gen.eval()
    y = torch.randn(1, C, 8, 8)
    with torch.no_grad():
        want = r_gen(y).numpy()

    sd = _state_dict_with_prefix(r_gen, "Generator")
    p = {}
    _set(p, "norm_in/gamma", _norm(sd["Generator.conv_block_init.0.gamma"]))
    _set(p, "norm_in/beta", _norm(sd["Generator.conv_block_init.0.beta"]))
    _set(p, "conv_head/Conv_0/kernel", _conv(sd["Generator.conv_block_init.2.weight"]))
    _set(p, "conv_head/Conv_0/bias", sd["Generator.conv_block_init.2.bias"])
    _set(p, "norm_head/gamma", _norm(sd["Generator.conv_block_init.3.gamma"]))
    _set(p, "norm_head/beta", _norm(sd["Generator.conv_block_init.3.beta"]))
    for m in range(n_res):
        tp = f"Generator.resblock_{m}"
        for conv, norm in (("conv1", "norm1"), ("conv2", "norm2")):
            _set(p, f"resblock_{m}/{conv}/Conv_0/kernel", _conv(sd[f"{tp}.{conv}.weight"]))
            _set(p, f"resblock_{m}/{conv}/Conv_0/bias", sd[f"{tp}.{conv}.bias"])
            _set(p, f"resblock_{m}/{norm}/gamma", _norm(sd[f"{tp}.{norm}.gamma"]))
            _set(p, f"resblock_{m}/{norm}/beta", _norm(sd[f"{tp}.{norm}.beta"]))
    for i in range(4):
        tp = f"Generator.upconv_block{i + 1}"
        _set(p, f"upconv{i}/kernel", _convT(sd[f"{tp}.0.weight"]))
        _set(p, f"upconv{i}/bias", sd[f"{tp}.0.bias"])
        _set(p, f"norm_up{i}/gamma", _norm(sd[f"{tp}.1.gamma"]))
        _set(p, f"norm_up{i}/beta", _norm(sd[f"{tp}.1.beta"]))
    _set(p, "conv_out/Conv_0/kernel", _conv(sd["Generator.conv_block_out.1.weight"]))
    _set(p, "conv_out/Conv_0/bias", sd["Generator.conv_block_out.1.bias"])

    gen = Generator(C=C, n_residual_blocks=n_res)
    got = gen.apply({"params": p}, jnp.asarray(y.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               atol=5e-4)


def test_hyperlatent_density_parity(ref):
    """cdf_logits and likelihood of the learned factorized density match the
    reference with identical (converted) parameters."""
    import jax.numpy as jnp

    from hific_tpu.models.density import HyperlatentDensity

    torch.manual_seed(2)
    n_channels = 6
    r_density = ref.hyperprior_model.HyperpriorDensity(n_channels=n_channels)
    x = torch.randn(n_channels, 1, 40)

    with torch.no_grad():
        want_logits = r_density.cdf_logits(x).numpy()
        want_lik = r_density.likelihood(
            torch.randn(2, n_channels, 4, 5), collapsed_format=False)

    params = {}
    sd = r_density.state_dict()
    for k in range(4):
        params[f"H_{k}"] = jnp.asarray(sd[f"H_{k}"].numpy())
        params[f"a_{k}"] = jnp.asarray(sd[f"a_{k}"].numpy())
        params[f"b_{k}"] = jnp.asarray(sd[f"b_{k}"].numpy())

    density = HyperlatentDensity(n_channels=n_channels)
    got_logits = density.apply({"params": params}, jnp.asarray(x.numpy()),
                               method=HyperlatentDensity.cdf_logits)
    np.testing.assert_allclose(np.asarray(got_logits), want_logits, atol=1e-5)


def test_hyperlatent_likelihood_parity(ref):
    import jax.numpy as jnp

    from hific_tpu.models.density import HyperlatentDensity

    torch.manual_seed(3)
    n_channels = 5
    r_density = ref.hyperprior_model.HyperpriorDensity(n_channels=n_channels)
    x = torch.randn(2, n_channels, 4, 6)
    with torch.no_grad():
        want = r_density.likelihood(x).numpy()  # (N,C,H,W)

    params = {}
    sd = r_density.state_dict()
    for k in range(4):
        params[f"H_{k}"] = jnp.asarray(sd[f"H_{k}"].numpy())
        params[f"a_{k}"] = jnp.asarray(sd[f"a_{k}"].numpy())
        params[f"b_{k}"] = jnp.asarray(sd[f"b_{k}"].numpy())

    density = HyperlatentDensity(n_channels=n_channels)
    got = density.apply({"params": params},
                        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               atol=1e-6)
