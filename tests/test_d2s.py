"""Depth-to-space generator tail (ops/d2s.py): exactness vs the standard
path. The rewrite is a pure index/weight reparametrization, so outputs
must agree to fp64 machine precision against the composed standard ops,
to float-reassociation noise at fp32 through the Generator, and to <=1
uint8 step through the full codec decode."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hific_tpu.models.generator import Generator
from hific_tpu.ops.channel_norm import channel_norm
from hific_tpu.ops.d2s import depth_to_space2, generator_tail_d2s
from hific_tpu.ops.padding import reflect_pad


def test_depth_to_space_order():
    c = 3
    x = np.arange(2 * 4 * 6 * 4 * c, dtype=np.float32).reshape(2, 4, 6, 4 * c)
    y = np.asarray(depth_to_space2(jnp.asarray(x)))
    for s in range(2):
        for t in range(2):
            for ch in range(c):
                packed_ch = (s * 2 + t) * c + ch
                np.testing.assert_array_equal(y[:, s::2, t::2, ch],
                                              x[:, :, :, packed_ch])


def _std_tail(x, w_up, b_up, g, b, w_out, b_out):
    """ConvTranspose(3x3 s2 p1 op1) + ChannelNorm + ReLU + reflect_pad(3)
    + 7x7 conv, composed from the same primitives models/layers.py uses."""
    y = jax.lax.conv_general_dilated(
        x, w_up, window_strides=(1, 1), padding=[(1, 2), (1, 2)],
        lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + b_up
    y = jax.nn.relu(channel_norm(y, g, b))
    y = reflect_pad(y, 3)
    z = jax.lax.conv_general_dilated(
        y, w_out, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return z + b_out


@pytest.mark.parametrize("hw", [(2, 2), (2, 5), (3, 3), (6, 4), (7, 9)])
def test_tail_transform_exact_fp64(hw):
    """Boundary-heavy shapes included: every reflect-pad phase shuffle and
    the transpose conv's zero-padding tap get exercised at H=W=2."""
    h, w = hw
    with jax.enable_x64(True):
        rng = np.random.RandomState(0)
        c1, c2 = 10, 6
        x = jnp.asarray(rng.randn(2, h, w, c1))
        w_up = jnp.asarray(rng.randn(3, 3, c1, c2) * 0.2)
        b_up = jnp.asarray(rng.randn(c2))
        g = jnp.asarray(rng.rand(c2) + 0.5)
        b = jnp.asarray(rng.randn(c2))
        w_out = jnp.asarray(rng.randn(7, 7, c2, 3) * 0.1)
        b_out = jnp.asarray(rng.randn(3))

        want = _std_tail(x, w_up, b_up, g, b, w_out, b_out)
        got = generator_tail_d2s(x, w_up, b_up, g, b, w_out, b_out)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-12, atol=1e-12)


@pytest.fixture(scope="module")
def gen_pair():
    """Standard and d2s-tail generators sharing one param tree."""
    rng = jax.random.PRNGKey(3)
    y = jnp.zeros((1, 4, 4, 8))
    gen = Generator(C=8, n_residual_blocks=1)
    params = gen.init(rng, y)["params"]
    gen_d2s = Generator(C=8, n_residual_blocks=1, d2s_tail=True)
    # identical trees: the d2s path declares the SAME params
    want = jax.tree_util.tree_structure(params)
    got = jax.tree_util.tree_structure(gen_d2s.init(rng, y)["params"])
    assert want == got
    return gen, gen_d2s, params


def test_generator_d2s_tail_matches_standard(gen_pair):
    gen, gen_d2s, params = gen_pair
    rng = np.random.RandomState(4)
    y = jnp.asarray(rng.randn(2, 3, 5, 8), jnp.float32)
    want = gen.apply({"params": params}, y)
    got = gen_d2s.apply({"params": params}, y)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_generator_d2s_tail_instance_norm_falls_back():
    """Non-channel norms can't fuse per-phase; the flag degrades to the
    standard path (identical program) rather than failing."""
    rng = jax.random.PRNGKey(5)
    y = jnp.asarray(np.random.RandomState(6).randn(1, 4, 4, 8), jnp.float32)
    gen = Generator(C=8, n_residual_blocks=1, norm_type="instance")
    params = gen.init(rng, y)["params"]
    gen_d2s = Generator(C=8, n_residual_blocks=1, norm_type="instance",
                        d2s_tail=True)
    got = gen_d2s.apply({"params": params}, y)
    want = gen.apply({"params": params}, y)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.slow
def test_codec_decode_matches_with_d2s(tmp_path):
    """Through the full codec: same weights and the same .hfc payload,
    d2s tail on vs off, reconstructions must agree to float noise (f32)
    and to <=1 uint8 step after quantization."""
    from hific_tpu.codec import Codec
    from hific_tpu.config import mse_lpips_config
    from hific_tpu.models.hific import HiFiC

    config = mse_lpips_config(latent_channels=8, n_residual_blocks=1,
                              hyperlatent_filters=8)
    model = HiFiC(config)
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "quantize": rng},
                        jnp.zeros((1, 64, 64, 3)), training=True)["params"]

    rs = np.random.RandomState(6)
    x = rs.rand(1, 80, 96, 3).astype(np.float32)

    codec = Codec(config, params)
    codec.build_tables()
    out = codec.compress(x)
    base_f32 = codec.decompress(out)
    base_u8 = codec.decompress(out, as_uint8=True)

    config2 = dataclasses.replace(config, d2s_generator_tail=True)
    codec2 = Codec(config2, params)
    codec2.factorized.import_tables(codec.factorized.tables.cdf,
                                    codec.factorized.tables.cdf_length,
                                    codec.factorized.tables.cdf_offset)
    codec2._tables_built = True
    d2s_f32 = codec2.decompress(out)
    d2s_u8 = codec2.decompress(out, as_uint8=True)

    np.testing.assert_allclose(np.asarray(d2s_f32), np.asarray(base_f32),
                               rtol=2e-5, atol=2e-5)
    assert int(np.max(np.abs(d2s_u8.astype(np.int16)
                             - base_u8.astype(np.int16)))) <= 1
