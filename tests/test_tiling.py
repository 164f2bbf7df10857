import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hific_tpu.tiling import tiled_apply


def test_tiling_exact_for_local_operator():
    """With halo >= operator radius, tiling must be EXACT."""
    radius = 8
    k = 2 * radius + 1
    kernel = jnp.ones((k, k, 1, 1), jnp.float32) / (k * k)

    def box_blur(x):
        xp = jnp.pad(x, ((0, 0), (radius, radius), (radius, radius), (0, 0)),
                     mode="reflect")
        return jax.lax.conv_general_dilated(
            xp, jnp.tile(kernel, (1, 1, 1, 3)).reshape(k, k, 1, 3),
            (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=3)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 100, 140, 3).astype(np.float32))
    whole = np.asarray(box_blur(x))
    tiled = tiled_apply(box_blur, x, tile=48, halo=radius)
    np.testing.assert_allclose(tiled, whole, atol=1e-6)

    # halo smaller than the radius -> must NOT be exact (sanity of the test)
    tiled_bad = tiled_apply(box_blur, x, tile=48, halo=2)
    assert np.abs(tiled_bad - whole).max() > 1e-4


def test_tiling_single_tile_identity():
    f = lambda x: x * 2.0
    x = jnp.ones((1, 32, 32, 3))
    np.testing.assert_allclose(np.asarray(tiled_apply(f, x, tile=64, halo=8)),
                               2.0 * np.asarray(x))


@pytest.mark.slow
def test_codec_tiled_decode_matches_whole():
    """Latent-space tiled generator decode vs whole decode: identical in the
    interior (same quantized latents — tiling only changes generator context
    at the margins)."""
    from hific_tpu.codec import Codec
    from hific_tpu.config import mse_lpips_config
    from hific_tpu.models.hific import HiFiC

    cfg = mse_lpips_config(latent_channels=8, n_residual_blocks=1,
                           hyperlatent_filters=16)
    model = HiFiC(cfg)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "quantize": rng},
                           jnp.zeros((1, 64, 64, 3)), training=True)
    codec = Codec(cfg, variables["params"])
    x = np.random.RandomState(0).rand(1, 256, 256, 3).astype(np.float32)
    out = codec.compress(x)
    whole = codec.decompress(out)
    tiled = codec.decompress(out, tile_latents=8, halo_latents=8)
    assert tiled.shape == whole.shape
    # halo 8 latent px = 128 image px of context; deep interior identical
    np.testing.assert_allclose(tiled[:, 112:144, 112:144],
                               whole[:, 112:144, 112:144], atol=1e-4)

    # the pipelined batch API's tiled path == the per-image tiled decode,
    # exactly, for every image and both wire formats (serve routes tiled
    # traffic through decompress_many now)
    out2 = codec.compress(np.random.RandomState(1)
                          .rand(1, 256, 256, 3).astype(np.float32))
    for as_uint8 in (False, True):
        singles = [codec.decompress(o, tile_latents=8, halo_latents=8,
                                    as_uint8=as_uint8)
                   for o in (out, out2)]
        batched = codec.decompress_many([out, out2], as_uint8=as_uint8,
                                        tile_latents=8, halo_latents=8)
        for s, b in zip(singles, batched):
            np.testing.assert_array_equal(np.asarray(s), np.asarray(b))


@pytest.mark.slow
def test_tiled_model_reconstruction():
    """Tiled eval forward of the tiny model: correct shape, and close to the
    whole-image forward away from seams."""
    from hific_tpu.config import ModelModes, mse_lpips_config
    from hific_tpu.models.hific import HiFiC

    cfg = mse_lpips_config(latent_channels=8, n_residual_blocks=1,
                           hyperlatent_filters=16)
    model = HiFiC(cfg)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "quantize": rng},
                           jnp.zeros((1, 64, 64, 3)), training=True)

    @jax.jit
    def forward(x):
        # Continuous path (no quantization): exactness is then purely a
        # question of halo vs receptive field. The quantized path rounds
        # differently near tile borders by construction.
        spatial = x.shape[1:3]
        y, _ = model.apply(variables, x, method=HiFiC.encode)
        return model.apply(variables, y, spatial, method=HiFiC.generate)

    x = jnp.asarray(np.random.RandomState(0).rand(1, 448, 448, 3)
                    .astype(np.float32))
    whole = np.asarray(forward(x))
    # total RF of the tiny model ~ 67 (encoder) + ~7*16 (generator) px; use
    # halo 192 > RF. Near image borders whole-image and tiled legitimately
    # differ (per-conv reflection vs input-level reflection), so compare the
    # deep interior where every pixel's RF is real content in both schemes.
    tiled = tiled_apply(forward, x, tile=112, halo=192)
    assert tiled.shape == whole.shape
    np.testing.assert_allclose(tiled[:, 192:256, 192:256],
                               whole[:, 192:256, 192:256], atol=1e-4)

    # quantized-path smoke on an odd-sized image: shape + finite
    @jax.jit
    def forward_q(x):
        inter, _ = model.apply(variables, x, training=False,
                               mode=ModelModes.EVALUATION,
                               rngs={"quantize": jax.random.PRNGKey(1)})
        return inter.reconstruction

    x_small = x[:, :160, :224]
    tiled_q = tiled_apply(forward_q, x_small, tile=64, halo=64)
    assert tiled_q.shape == (1, 160, 224, 3) and np.isfinite(tiled_q).all()


@pytest.mark.slow
def test_codec_tiled_encode_bitexact_vs_whole():
    """Encode-side tiling: with halo >= the encoder receptive field, the
    tiled compression of a large image produces a BYTE-IDENTICAL container
    to whole-image compression (VERDICT r1 #5: arbitrary-resolution
    compression in bounded HBM, reference OOM >4000^2)."""
    from hific_tpu.codec import Codec
    from hific_tpu.config import mse_lpips_config
    from hific_tpu.entropy.container import save_compressed
    from hific_tpu.models.hific import HiFiC

    cfg = mse_lpips_config(latent_channels=8, n_residual_blocks=1,
                           hyperlatent_filters=16)
    model = HiFiC(cfg)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "quantize": rng},
                           jnp.zeros((1, 64, 64, 3)), training=True)
    codec = Codec(cfg, variables["params"])
    codec.build_tables()

    # Non-multiple-of-tile, non-multiple-of-16 size: exercises both the
    # tile-grid reflect padding and the latent crop.
    x = np.random.RandomState(1).rand(1, 152, 136, 3).astype(np.float32)
    whole = codec.compress(x)
    tiled = codec.compress(x, tile_image=64, halo_image=64)

    assert tiled.hyper_coding_shape == whole.hyper_coding_shape
    assert tiled.latent_coding_shape == whole.latent_coding_shape
    np.testing.assert_array_equal(tiled.hyperlatents_encoded,
                                  whole.hyperlatents_encoded)
    np.testing.assert_array_equal(tiled.latents_encoded,
                                  whole.latents_encoded)
    np.testing.assert_allclose(tiled.total_bpp, whole.total_bpp, rtol=1e-5)

    import io
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        p1, p2 = os.path.join(d, "a.hfc"), os.path.join(d, "b.hfc")
        save_compressed(whole, p1)
        save_compressed(tiled, p2)
        with open(p1, "rb") as f1, open(p2, "rb") as f2:
            assert f1.read() == f2.read()

    # full bounded pipeline: tiled encode + tiled decode round trip
    recon_whole = codec.decompress(whole, as_uint8=True)
    recon_tiled = codec.decompress(tiled, tile_latents=4, halo_latents=4,
                                   as_uint8=True)
    assert recon_tiled.shape == recon_whole.shape

    # an insufficient halo must NOT be bit-exact (sanity of the exactness
    # claim: the encoder's one-sided receptive extent is 49 px — the
    # asymmetric stride-2 pads skew the windows — so halo 16 is too small)
    tiled_bad = codec.compress(x, tile_image=64, halo_image=16)
    assert (tiled_bad.latents_encoded.tobytes()
            != whole.latents_encoded.tobytes())
