"""Space-to-depth encoder front (ops/s2d.py): exactness vs the standard
path. The rewrite is a pure index/weight reparametrization, so outputs
must agree to float-reassociation noise at fp32 — and produce IDENTICAL
integer symbols through the full codec."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hific_tpu.models.encoder import Encoder
from hific_tpu.ops.s2d import (
    down0_kernel_s2d,
    encoder_front_s2d,
    space_to_depth2,
    stem_kernel_s2d,
)


def test_space_to_depth_order():
    x = np.arange(2 * 4 * 6 * 3, dtype=np.float32).reshape(2, 4, 6, 3)
    y = np.asarray(space_to_depth2(jnp.asarray(x)))
    for a in range(2):
        for b in range(2):
            for c in range(3):
                ch = (a * 2 + b) * 3 + c
                np.testing.assert_array_equal(y[:, :, :, ch],
                                              x[:, a::2, b::2, c])


def _stem_reference(x, w, b):
    """reflect_pad(3) + 7x7 VALID conv, fp64 for a tight oracle."""
    xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
    return jax.lax.conv_general_dilated(
        xp, w, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b


def test_stem_kernel_transform_exact():
    with jax.enable_x64(True):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(1, 16, 12, 3), jnp.float64)
        w = jnp.asarray(rng.randn(7, 7, 3, 5), jnp.float64)
        b = jnp.asarray(rng.randn(5), jnp.float64)

        want = _stem_reference(x, w, b)
        xp = space_to_depth2(jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)),
                                     mode="reflect"))
        y2 = jax.lax.conv_general_dilated(
            xp, stem_kernel_s2d(w), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + jnp.tile(b, 4)
        # depth-to-space: channel (s, t, o) -> full-res pixel (2u+s, 2v+t, o)
        n, hh, ww, _ = y2.shape
        got = y2.reshape(n, hh, ww, 2, 2, 5).transpose(0, 1, 3, 2, 4, 5)
        got = got.reshape(n, 2 * hh, 2 * ww, 5)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-12, atol=1e-12)


def test_down0_kernel_transform_exact():
    with jax.enable_x64(True):
        rng = np.random.RandomState(1)
        y = jnp.asarray(rng.randn(1, 16, 12, 6), jnp.float64)
        w = jnp.asarray(rng.randn(3, 3, 6, 4), jnp.float64)
        b = jnp.asarray(rng.randn(4), jnp.float64)

        # standard: asym reflect pad (top=1, right=1) + 3x3 stride-2 VALID
        yp = jnp.pad(y, ((0, 0), (1, 0), (0, 1), (0, 0)), mode="reflect")
        want = jax.lax.conv_general_dilated(
            yp, w, (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b

        packed = space_to_depth2(y)
        packed = jnp.pad(packed, ((0, 0), (1, 0), (0, 1), (0, 0)),
                         mode="edge")
        got = jax.lax.conv_general_dilated(
            packed, down0_kernel_s2d(w), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-12, atol=1e-12)


@pytest.fixture(scope="module")
def enc_pair():
    """Standard and s2d encoders sharing one param tree."""
    rng = jax.random.PRNGKey(3)
    x = jnp.zeros((1, 32, 32, 3))
    enc = Encoder(C=8)
    params = enc.init(rng, x)["params"]
    enc_s2d = Encoder(C=8, s2d_front=True)
    # identical trees: the s2d path declares the SAME params
    want = jax.tree_util.tree_structure(params)
    got = jax.tree_util.tree_structure(enc_s2d.init(rng, x)["params"])
    assert want == got
    return enc, enc_s2d, params


def test_encoder_s2d_front_matches_standard(enc_pair):
    enc, enc_s2d, params = enc_pair
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.rand(2, 48, 32, 3), jnp.float32)
    want = enc.apply({"params": params}, x)
    got = enc_s2d.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_encoder_s2d_odd_input_falls_back(enc_pair):
    """Odd spatial dims can't pack; the flag degrades to the standard path
    (identical program) rather than failing (the codec pads to x16
    anyway)."""
    enc, enc_s2d, params = enc_pair
    x = jnp.asarray(np.random.RandomState(5).rand(1, 33, 31, 3), jnp.float32)
    got = enc_s2d.apply({"params": params}, x)
    want = enc.apply({"params": params}, x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.slow
def test_codec_symbols_identical_with_s2d(tmp_path):
    """Through the full codec: same weights, s2d on vs off, the coded
    symbol planes (and therefore the files) must be identical."""
    import dataclasses

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
    base = codec.compress(x)

    config2 = dataclasses.replace(config, s2d_encoder_front=True)
    codec2 = Codec(config2, params)
    codec2.factorized.import_tables(codec.factorized.tables.cdf,
                                    codec.factorized.tables.cdf_length,
                                    codec.factorized.tables.cdf_offset)
    codec2._tables_built = True
    s2d = codec2.compress(x)

    np.testing.assert_array_equal(base.hyperlatents_encoded,
                                  s2d.hyperlatents_encoded)
    np.testing.assert_array_equal(base.latents_encoded, s2d.latents_encoded)
