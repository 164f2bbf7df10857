"""Torch->JAX conversion: layer-level numerical equivalence and full-tree
structural round trip against a synthetic reference-style state_dict."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from hific_tpu.models.layers import Conv, ConvTranspose
from hific_tpu.ops.padding import asymmetric_pad_2x, reflect_pad
from hific_tpu.utils.convert_torch import _conv, _convT, convert_state_dict


def test_conv_equivalence_reflect_pad():
    """ReflectionPad2d + Conv2d (torch) == reflect_pad + Conv (ours) with
    converted weights."""
    rng = np.random.RandomState(0)
    x = rng.randn(1, 5, 16, 16).astype(np.float32)  # NCHW
    tconv = torch.nn.Conv2d(5, 7, 3, stride=1)
    with torch.no_grad():
        want = tconv(torch.nn.ReflectionPad2d(1)(torch.tensor(x))).numpy()

    m = Conv(7, 3, stride=1)
    params = {"params": {"Conv_0": {
        "kernel": jnp.asarray(_conv(tconv.weight.detach().numpy())),
        "bias": jnp.asarray(tconv.bias.detach().numpy()),
    }}}
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    got = m.apply(params, reflect_pad(x_nhwc, 1))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               atol=1e-4)


def test_strided_conv_asymmetric_pad_equivalence():
    """The encoder's downsampling block: ReflectionPad2d((0,1,1,0)) +
    stride-2 valid conv."""
    rng = np.random.RandomState(1)
    x = rng.randn(1, 4, 16, 16).astype(np.float32)
    tconv = torch.nn.Conv2d(4, 6, 3, stride=2, padding=0)
    with torch.no_grad():
        want = tconv(torch.nn.ReflectionPad2d((0, 1, 1, 0))(
            torch.tensor(x))).numpy()

    m = Conv(6, 3, stride=2)
    params = {"params": {"Conv_0": {
        "kernel": jnp.asarray(_conv(tconv.weight.detach().numpy())),
        "bias": jnp.asarray(tconv.bias.detach().numpy()),
    }}}
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    got = m.apply(params, asymmetric_pad_2x(x_nhwc))
    assert got.shape[1:3] == (8, 8)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               atol=1e-4)


@pytest.mark.parametrize("k,s,p,op", [(3, 2, 1, 1), (5, 2, 2, 1)])
def test_conv_transpose_equivalence(k, s, p, op):
    rng = np.random.RandomState(2)
    x = rng.randn(1, 4, 8, 8).astype(np.float32)
    tconv = torch.nn.ConvTranspose2d(4, 6, k, stride=s, padding=p,
                                     output_padding=op)
    with torch.no_grad():
        want = tconv(torch.tensor(x)).numpy()

    m = ConvTranspose(6, k, stride=s, padding=p, output_padding=op)
    params = {"params": {
        "kernel": jnp.asarray(_convT(tconv.weight.detach().numpy())),
        "bias": jnp.asarray(tconv.bias.detach().numpy()),
    }}
    got = m.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert got.shape[1:3] == want.shape[2:]
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               atol=1e-4)


def _synthetic_reference_state_dict(C=8, N=16, n_res=1, gan=True):
    """Random tensors with the reference's exact names and shapes."""
    rng = np.random.RandomState(0)
    sd = {}

    def t(*shape):
        return rng.randn(*shape).astype(np.float32) * 0.05

    enc_f = (60, 120, 240, 480, 960)
    sd["Encoder.conv_block1.1.weight"] = t(enc_f[0], 3, 7, 7)
    sd["Encoder.conv_block1.1.bias"] = t(enc_f[0])
    sd["Encoder.conv_block1.2.gamma"] = t(1, enc_f[0], 1, 1)
    sd["Encoder.conv_block1.2.beta"] = t(1, enc_f[0], 1, 1)
    for i in range(4):
        ci, co = enc_f[i], enc_f[i + 1]
        pre = f"Encoder.conv_block{i + 2}"
        sd[f"{pre}.1.weight"] = t(co, ci, 3, 3)
        sd[f"{pre}.1.bias"] = t(co)
        sd[f"{pre}.2.gamma"] = t(1, co, 1, 1)
        sd[f"{pre}.2.beta"] = t(1, co, 1, 1)
    sd["Encoder.conv_block_out.1.weight"] = t(C, enc_f[4], 3, 3)
    sd["Encoder.conv_block_out.1.bias"] = t(C)

    gen_f = (960, 480, 240, 120, 60)
    sd["Generator.conv_block_init.0.gamma"] = t(1, C, 1, 1)
    sd["Generator.conv_block_init.0.beta"] = t(1, C, 1, 1)
    sd["Generator.conv_block_init.2.weight"] = t(gen_f[0], C, 3, 3)
    sd["Generator.conv_block_init.2.bias"] = t(gen_f[0])
    sd["Generator.conv_block_init.3.gamma"] = t(1, gen_f[0], 1, 1)
    sd["Generator.conv_block_init.3.beta"] = t(1, gen_f[0], 1, 1)
    for m in range(n_res):
        pre = f"Generator.resblock_{m}"
        for c in ("conv1", "conv2"):
            sd[f"{pre}.{c}.weight"] = t(gen_f[0], gen_f[0], 3, 3)
            sd[f"{pre}.{c}.bias"] = t(gen_f[0])
        for nrm in ("norm1", "norm2"):
            sd[f"{pre}.{nrm}.gamma"] = t(1, gen_f[0], 1, 1)
            sd[f"{pre}.{nrm}.beta"] = t(1, gen_f[0], 1, 1)
    for i in range(4):
        ci, co = gen_f[i], gen_f[i + 1]
        pre = f"Generator.upconv_block{i + 1}"
        sd[f"{pre}.0.weight"] = t(ci, co, 3, 3)  # ConvTranspose: (I,O,kh,kw)
        sd[f"{pre}.0.bias"] = t(co)
        sd[f"{pre}.1.gamma"] = t(1, co, 1, 1)
        sd[f"{pre}.1.beta"] = t(1, co, 1, 1)
    sd["Generator.conv_block_out.1.weight"] = t(3, gen_f[4], 7, 7)
    sd["Generator.conv_block_out.1.bias"] = t(3)

    sd["Hyperprior.analysis_net.conv1.weight"] = t(N, C, 3, 3)
    sd["Hyperprior.analysis_net.conv1.bias"] = t(N)
    for i in (2, 3):
        sd[f"Hyperprior.analysis_net.conv{i}.weight"] = t(N, N, 5, 5)
        sd[f"Hyperprior.analysis_net.conv{i}.bias"] = t(N)
    for net in ("synthesis_mu", "synthesis_std"):
        for i in (1, 2):
            sd[f"Hyperprior.{net}.conv{i}.weight"] = t(N, N, 5, 5)  # (I,O,..)
            sd[f"Hyperprior.{net}.conv{i}.bias"] = t(N)
        # conv3 is ConvTranspose2d(N, C, 3, s1): weight layout (I=N, O=C,..)
        sd[f"Hyperprior.{net}.conv3.weight"] = t(N, C, 3, 3)
        sd[f"Hyperprior.{net}.conv3.bias"] = t(C)
    filters = (1, 3, 3, 3, 1)
    for k in range(4):
        sd[f"Hyperprior.hyperlatent_likelihood.H_{k}"] = t(
            N, filters[k + 1], filters[k])
        sd[f"Hyperprior.hyperlatent_likelihood.a_{k}"] = t(N, filters[k + 1], 1)
        sd[f"Hyperprior.hyperlatent_likelihood.b_{k}"] = t(N, filters[k + 1], 1)

    if gan:
        sd["Discriminator.context_conv.weight"] = t(12, C, 3, 3)
        sd["Discriminator.context_conv.bias"] = t(12)
        disc_f = (64, 128, 256, 512)
        cin = 3 + 12
        for i, co in enumerate(disc_f, start=1):
            sd[f"Discriminator.conv{i}.weight_orig"] = t(co, cin, 4, 4)
            sd[f"Discriminator.conv{i}.bias"] = t(co)
            sd[f"Discriminator.conv{i}.weight_u"] = t(co)
            cin = co
        sd["Discriminator.conv_out.weight"] = t(1, 512, 1, 1)
        sd["Discriminator.conv_out.bias"] = t(1)
    return sd


def test_full_state_dict_conversion_loads_and_runs():
    from hific_tpu.config import hific_config
    from hific_tpu.models.hific import HiFiC

    sd = _synthetic_reference_state_dict()
    params, disc, spectral = convert_state_dict(sd, n_residual_blocks=1)

    cfg = hific_config(latent_channels=8, n_residual_blocks=1,
                       hyperlatent_filters=16)
    model = HiFiC(cfg)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 64, 64, 3))
    template = model.init({"params": rng, "quantize": rng}, x, training=True)

    # Structural match: every template leaf must be provided with the same
    # shape (discriminator checked separately).
    import flax

    tmpl_flat = flax.traverse_util.flatten_dict(template["params"], sep="/")
    conv_flat = flax.traverse_util.flatten_dict(params, sep="/")
    assert set(tmpl_flat) == set(conv_flat), (
        set(tmpl_flat) ^ set(conv_flat))
    for k in tmpl_flat:
        assert tmpl_flat[k].shape == conv_flat[k].shape, (
            k, tmpl_flat[k].shape, conv_flat[k].shape)

    # Converted tree actually runs.
    out, _ = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)}, x,
        training=False, rngs={"quantize": rng})
    assert out.reconstruction.shape == (1, 64, 64, 3)

    # Discriminator tree matches too.
    from hific_tpu.models.discriminator import Discriminator

    d = Discriminator()
    dv = d.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                jnp.zeros((1, 4, 4, 8)))
    d_tmpl = flax.traverse_util.flatten_dict(dv["params"], sep="/")
    d_conv = flax.traverse_util.flatten_dict(disc, sep="/")
    assert set(d_tmpl) == set(d_conv)
    for k in d_tmpl:
        assert d_tmpl[k].shape == d_conv[k].shape, k
    s_tmpl = flax.traverse_util.flatten_dict(dv["spectral"], sep="/")
    s_conv = flax.traverse_util.flatten_dict(spectral, sep="/")
    assert set(s_tmpl) == set(s_conv)


def test_converted_encoder_matches_torch_pipeline():
    """Numerical parity of a two-block torch encoder stack vs ours."""
    rng = np.random.RandomState(3)
    x = rng.rand(1, 3, 32, 32).astype(np.float32)

    conv1 = torch.nn.Conv2d(3, 6, 7)
    conv2 = torch.nn.Conv2d(6, 12, 3, stride=2)
    gamma = torch.nn.Parameter(torch.randn(1, 6, 1, 1) * 0.1 + 1)
    beta = torch.nn.Parameter(torch.randn(1, 6, 1, 1) * 0.1)
    with torch.no_grad():
        h = conv1(torch.nn.ReflectionPad2d(3)(torch.tensor(x)))
        mu = h.mean(dim=1, keepdim=True)
        var = h.var(dim=1, keepdim=True)
        h = gamma * ((h - mu) * torch.rsqrt(var + 1e-3)) + beta
        h = torch.relu(h)
        want = conv2(torch.nn.ReflectionPad2d((0, 1, 1, 0))(h)).numpy()

    from hific_tpu.models.layers import Conv, Norm

    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    h = Conv(6, 7).apply({"params": {"Conv_0": {
        "kernel": jnp.asarray(_conv(conv1.weight.detach().numpy())),
        "bias": jnp.asarray(conv1.bias.detach().numpy())}}},
        reflect_pad(x_nhwc, 3))
    h = Norm("channel", "relu").apply({"params": {
        "gamma": jnp.asarray(gamma.detach().numpy().reshape(-1)),
        "beta": jnp.asarray(beta.detach().numpy().reshape(-1))}}, h)
    got = Conv(12, 3, stride=2).apply({"params": {"Conv_0": {
        "kernel": jnp.asarray(_conv(conv2.weight.detach().numpy())),
        "bias": jnp.asarray(conv2.bias.detach().numpy())}}},
        asymmetric_pad_2x(h))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               atol=1e-4)
