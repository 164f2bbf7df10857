"""Codec round-trip tests: tables, entropy models, container, full pipeline.

Ports of the reference's implicit invariants (SURVEY.md §4): rANS round-trip
symbol equality, attained bits ~ estimated Shannon bits, actual file bpp vs
theoretical bpp, tail-estimation accuracy vs scipy quantiles.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hific_tpu.config import mse_lpips_config
from hific_tpu.entropy.entropy_models import (
    ConditionalEntropyModel,
    FactorizedEntropyModel,
)
from hific_tpu.entropy.tables import estimate_tails

TINY = dict(
    latent_channels=8,
    n_residual_blocks=1,
    hyperlatent_filters=16,
    crop_size=64,
)


def test_estimate_tails_gaussian():
    import scipy.stats

    for q in (0.42, 0.93):
        cdf = lambda x: 0.5 * (1.0 + jax.lax.erf(x / np.sqrt(2.0)))
        tails = estimate_tails(cdf, q, (10,))
        np.testing.assert_allclose(
            np.asarray(tails), scipy.stats.norm.ppf(q), atol=2e-2)


def test_estimate_tails_logistic():
    import scipy.stats

    tails = estimate_tails(jax.nn.sigmoid, 0.79, (6,))
    np.testing.assert_allclose(
        np.asarray(tails), scipy.stats.logistic.ppf(0.79), atol=2e-2)


def test_conditional_entropy_model_roundtrip():
    """Mean-scale model: decoded_raw == rounded, bits ~ entropy (reference
    prior_model.py:317-359 smoke test)."""
    rng = np.random.RandomState(0)
    m = ConditionalEntropyModel("gaussian")
    shape = (1, 24, 16, 16)
    loc, scale_mean = 2.401, 3.43
    y = rng.randn(*shape).astype(np.float32)
    means = rng.randn(*shape).astype(np.float32)
    scales = np.clip(rng.randn(*shape) * np.sqrt(scale_mean) + loc,
                     0.11, None).astype(np.float32)

    bits, bpp, _ = m.estimate_bits(y, means, scales, shape[2:])
    encoded, coding_shape = m.compress(y, means, scales)
    decoded = m.decompress(encoded, means, scales)

    rounded = np.floor(y + 0.5 - means) + means
    np.testing.assert_allclose(decoded, rounded, atol=1e-5)

    attained = 32 * len(encoded)
    lane_overhead = 64 * np.prod(coding_shape)
    assert attained <= bits * 1.1 + lane_overhead


def test_conditional_entropy_model_scalar_path():
    rng = np.random.RandomState(1)
    m = ConditionalEntropyModel("gaussian")
    shape = (1, 4, 6, 6)
    y = rng.randn(*shape).astype(np.float32) * 3
    means = rng.randn(*shape).astype(np.float32)
    scales = np.clip(np.abs(rng.randn(*shape)) * 2, 0.11, None).astype(np.float32)
    encoded, _ = m.compress(y, means, scales, vectorize=False)
    decoded = m.decompress(encoded, means, scales, vectorize=False)
    np.testing.assert_allclose(decoded, np.floor(y + 0.5 - means) + means,
                               atol=1e-5)


@pytest.fixture(scope="module")
def factorized_model():
    """A trained-at-init HyperlatentDensity wrapped in the entropy model."""
    from hific_tpu.models.density import HyperlatentDensity

    n_channels = 6
    density = HyperlatentDensity(n_channels=n_channels)
    params = density.init(jax.random.PRNGKey(0),
                          jnp.zeros((n_channels, 1, 4)),
                          method=HyperlatentDensity.likelihood_collapsed)

    def cdf_logits_fn(t):
        return density.apply(params, t, stop_gradient=True,
                             method=HyperlatentDensity.cdf_logits)

    def likelihood_fn(t):
        return density.apply(params, t,
                             method=HyperlatentDensity.likelihood_collapsed)

    m = FactorizedEntropyModel(cdf_logits_fn, likelihood_fn, n_channels)
    m.build_tables()
    return m


def test_factorized_entropy_model_roundtrip(factorized_model):
    """Reference hyperprior_model.py:390-432 smoke test."""
    m = factorized_model
    rng = np.random.RandomState(2)
    shape = (1, m.n_channels, 17, 23)
    z = (rng.randn(*shape) * 4).astype(np.float32)

    bits, bpp, _ = m.estimate_bits(z, shape[2:])
    encoded, coding_shape = m.compress(z)
    decoded = m.decompress(encoded, 1, shape[2:])
    np.testing.assert_array_equal(decoded, np.floor(z + 0.5))

    attained = 32 * len(encoded)
    lane_overhead = 64 * np.prod(coding_shape)
    assert attained <= bits * 1.2 + lane_overhead


def test_factorized_batch2(factorized_model):
    m = factorized_model
    rng = np.random.RandomState(3)
    shape = (2, m.n_channels, 8, 8)
    z = (rng.randn(*shape) * 2).astype(np.float32)
    encoded, _ = m.compress(z)
    decoded = m.decompress(encoded, 2, shape[2:])
    np.testing.assert_array_equal(decoded, np.floor(z + 0.5))


@pytest.fixture(scope="module")
def tiny_codec():
    from hific_tpu.codec import Codec
    from hific_tpu.models.hific import HiFiC

    cfg = mse_lpips_config(**TINY)
    model = HiFiC(cfg)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "quantize": rng},
                           jnp.zeros((1, 64, 64, 3)), training=True)
    codec = Codec(cfg, variables["params"])
    codec.build_tables()
    return codec


def test_codec_end_to_end_roundtrip(tiny_codec, tmp_path):
    """Full compress -> .hfc file -> decompress; reconstruction must be
    identical whether latents come from the encoder or the file (the codec's
    core guarantee), and actual file bpp ~ theoretical bpp."""
    rng = np.random.RandomState(0)
    x = rng.rand(1, 80, 96, 3).astype(np.float32)  # non-multiple of 64

    out = tiny_codec.compress(x)
    recon_direct = tiny_codec.decompress(out)
    assert recon_direct.shape == (1, 80, 96, 3)
    assert recon_direct.min() >= 0.0 and recon_direct.max() <= 1.0

    path = os.path.join(tmp_path, "test.hfc")
    actual_bpp, theoretical_bpp = tiny_codec.compress_file(x, path)
    recon_file = tiny_codec.decompress_file(path)
    np.testing.assert_array_equal(recon_direct, recon_file)

    # actual includes the header + 64-bit/lane rANS overhead
    n_pixels = 80 * 96
    overhead_bpp = (64 * (8 + 16) + 500 * 8) / n_pixels
    assert actual_bpp <= theoretical_bpp + overhead_bpp + 1.0
    assert np.isfinite(theoretical_bpp) and theoretical_bpp > 0


def test_reconstruct_equals_coded_roundtrip(tiny_codec):
    """reconstruct() (no rANS) must equal decompress(compress()) EXACTLY:
    the entropy coder is lossless on the quantized symbols."""
    x = np.random.RandomState(3).rand(1, 64, 96, 3).astype(np.float32)
    via_codec = tiny_codec.decompress(tiny_codec.compress(x))
    direct = tiny_codec.reconstruct(x)
    np.testing.assert_array_equal(via_codec, direct)


def test_tiny_image_and_bucketing(tiny_codec):
    """Images far below the crop size round-trip (pad to 16 then 4), and
    shape bucketing pads before encoding but crops the reconstruction."""
    x = np.random.RandomState(4).rand(1, 20, 30, 3).astype(np.float32)
    out = tiny_codec.compress(x)
    recon = tiny_codec.decompress(out)
    assert recon.shape == (1, 20, 30, 3)

    out_b = tiny_codec.compress(x, shape_bucket=128)
    recon_b = tiny_codec.decompress(out_b)
    assert recon_b.shape == (1, 20, 30, 3)
    # bucketing pads the coded latent map to the bucket grid (128 -> 8x8
    # latents vs 2x2-padded-to-4x4 without)
    assert out_b.hyperlatent_spatial_shape != out.hyperlatent_spatial_shape
    assert len(out_b.latents_encoded) > len(out.latents_encoded)


def test_coding_idx_comes_from_shared_synth_stats(tiny_codec):
    """The CDF-row indices the encoder codes with must be EXACTLY the
    output of the standalone `_synth_stats_p` executable on the coded
    hyperlatent symbols — the same program every decoder runs. A fused
    recompute of the same math is NOT bit-identical across XLA programs
    (round-5 TPU diagnosis: 3744/2.7M flipped indices at a (128,96) latent
    grid => rANS desync => destroyed image; scripts/diag_flagship5.py).
    This pins the structural invariant on every backend."""
    x = np.random.RandomState(11).rand(1, 80, 96, 3).astype(np.float32)

    # Host-coder path: indices travel inside the packed buffer.
    buf, z_shape, y_shape, _ = tiny_codec._enqueue_host_compress(
        jnp.asarray(x))
    z_sym, _, idx_coded, _, _ = tiny_codec._unpack_compressed(
        np.asarray(buf), z_shape, y_shape)
    _, _, idx_ref = tiny_codec._synth_stats_p(
        tiny_codec.params, jnp.asarray(z_sym, jnp.int16),
        tiny_codec._scale_table_dev)
    np.testing.assert_array_equal(idx_coded, np.asarray(idx_ref))

    # Decoder side re-derives indices from the decoded hyperlatents via the
    # same executable: the full round trip must therefore be exact.
    out = tiny_codec.compress(x)
    z_dec = tiny_codec.factorized.decompress_symbols(
        out.hyperlatents_encoded, out.batch_shape,
        out.hyperlatent_spatial_shape, vectorize=True)
    np.testing.assert_array_equal(
        z_dec.reshape(np.asarray(z_sym).transpose(0, 3, 1, 2).shape),
        np.asarray(z_sym).transpose(0, 3, 1, 2))


def test_corrupt_container_rejected(tiny_codec, tmp_path):
    x = np.random.RandomState(5).rand(1, 64, 64, 3).astype(np.float32)
    path = os.path.join(tmp_path, "c.hfc")
    tiny_codec.compress_file(x, path)
    blob = bytearray(open(path, "rb").read())
    blob[22] ^= 0xFF  # clobber the header magic (after 22 bytes of shapes)
    open(path, "wb").write(bytes(blob))
    with pytest.raises(AssertionError, match="corrupt"):
        tiny_codec.decompress_file(path)


def test_codec_deterministic(tiny_codec):
    x = np.random.RandomState(7).rand(1, 64, 64, 3).astype(np.float32)
    out1 = tiny_codec.compress(x)
    out2 = tiny_codec.compress(x)
    np.testing.assert_array_equal(out1.latents_encoded, out2.latents_encoded)
    np.testing.assert_array_equal(out1.hyperlatents_encoded,
                                  out2.hyperlatents_encoded)


def test_packed_wire_escape_path(tiny_codec):
    """int8 symbol wire format: when latent symbols exceed int8 (forced by
    scaling the encoder output enormously), the escape slots (and the int16
    fallback beyond them) must keep the round trip exact."""
    from hific_tpu.models.hific import N_LATENT_ESCAPES

    codec = tiny_codec
    base = codec.params

    def scale(alpha):
        conv = dict(base["encoder"]["conv_out"]["Conv_0"])
        conv = {"kernel": conv["kernel"] * alpha, "bias": conv["bias"] * alpha}
        return {**dict(base),
                "encoder": {**dict(base["encoder"]),
                            "conv_out": {"Conv_0": conv}}}

    x = jnp.asarray(np.random.RandomState(3).rand(1, 64, 64, 3), jnp.float32)
    try:
        for alpha, expect_escapes in [(1.0, False), (400.0, True)]:
            codec.params = scale(alpha)
            codec._shape_cache.clear()
            out = codec.compress(x)
            # ground truth via the unpacked int16 program
            _, y16, _, _, _ = codec._compress_syms_p(
                codec.params, x, codec._scale_table_dev)
            y16 = np.asarray(y16)
            has_escapes = np.any((y16 < -128) | (y16 > 127))
            assert has_escapes == expect_escapes
            recon_u8 = codec.decompress(out, as_uint8=True)
            recon_f = codec.decompress(out)
            assert recon_u8.dtype == np.uint8
            # u8 output is exactly the PNG quantization of the float output
            np.testing.assert_array_equal(
                recon_u8,
                np.clip(np.asarray(recon_f) * 255.0 + 0.5,
                        0, 255).astype(np.uint8))
    finally:
        codec.params = base
        codec._shape_cache.clear()


@pytest.mark.slow
def test_compress_many_chunk_batched_matches_serial(tiny_codec):
    """Chunk-batched device compression (vmapped program: one upload/
    dispatch/fetch per chunk of same-shape host images) emits byte-identical
    streams to per-image compression, across a shape break and an odd-size
    tail, with output order preserved."""
    rng = np.random.RandomState(17)
    images = [rng.randint(0, 256, size=(1, 64, 64, 3), dtype=np.uint8)
              for _ in range(3)]
    # Different shape in the middle breaks the batching run.
    images.insert(1, rng.randint(0, 256, size=(1, 64, 96, 3), dtype=np.uint8))

    tiny_codec.pipeline_chunk = 2
    try:
        outs = tiny_codec.compress_many(images)
        assert len(outs) == len(images)
        for img, out in zip(images, outs):
            want = tiny_codec.compress(img)      # host-coder reference
            np.testing.assert_array_equal(out.hyperlatents_encoded,
                                          want.hyperlatents_encoded)
            np.testing.assert_array_equal(out.latents_encoded,
                                          want.latents_encoded)
            assert out.spatial_shape == want.spatial_shape
            np.testing.assert_allclose(out.total_bpp, want.total_bpp,
                                       rtol=1e-4)

        # Chunk-batched decode returns exactly the pixels of the serial
        # round trip — cross-chunk-size determinism of the synthesis stats
        # (the codec's core invariant) included.
        recons = tiny_codec.decompress_many(outs, as_uint8=True)
    finally:
        tiny_codec.pipeline_chunk = 1
    for img, out, got in zip(images, outs, recons):
        want = tiny_codec.decompress(tiny_codec.compress(img), as_uint8=True)
        np.testing.assert_array_equal(got, want)


def test_chunk_batched_escape_paths(tiny_codec):
    """Escapes through the batched programs: latent symbols beyond int8
    force the device-encode capacity/escape handling per batch row; the
    chunked round trip must stay exact and match the serial one."""
    codec = tiny_codec
    base = codec.params
    conv = dict(base["encoder"]["conv_out"]["Conv_0"])
    conv = {"kernel": conv["kernel"] * 40.0, "bias": conv["bias"] * 40.0}
    try:
        codec.params = {**dict(base),
                        "encoder": {**dict(base["encoder"]),
                                    "conv_out": {"Conv_0": conv}}}
        codec._shape_cache.clear()
        codec.pipeline_chunk = 2
        rng = np.random.RandomState(19)
        images = [rng.randint(0, 256, size=(1, 64, 64, 3), dtype=np.uint8)
                  for _ in range(2)]
        outs = codec.compress_many(images)
        for img, out in zip(images, outs):
            want = codec.compress(img)
            np.testing.assert_array_equal(out.latents_encoded,
                                          want.latents_encoded)
        recons = codec.decompress_many(outs, as_uint8=True)
        for out, got in zip(outs, recons):
            want = codec.decompress(out, as_uint8=True, device_decode=False)
            np.testing.assert_array_equal(got, want)
    finally:
        codec.params = base
        codec._shape_cache.clear()
        codec.pipeline_chunk = 1


def test_decompress_many_matches_serial(tiny_codec, tmp_path):
    """Pipelined batch decode == per-image decode, exactly."""
    rng = np.random.RandomState(5)
    images = [jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
              for _ in range(3)]
    outs = tiny_codec.compress_many(images)
    batched = tiny_codec.decompress_many(outs, as_uint8=True)
    for out, got in zip(outs, batched):
        want = tiny_codec.decompress(out, as_uint8=True)
        np.testing.assert_array_equal(got, want)
    floats = tiny_codec.decompress_many(outs, as_uint8=False)
    np.testing.assert_allclose(np.asarray(floats[0]),
                               np.asarray(tiny_codec.decompress(outs[0])),
                               atol=0)
    # as_numpy=False: device-resident results (bench's transport-
    # independent metric fences these with a scalar fetch), same pixels
    dev = tiny_codec.decompress_many(outs, as_uint8=True, as_numpy=False)
    for got_dev, want in zip(dev, batched):
        assert isinstance(got_dev, jax.Array)
        np.testing.assert_array_equal(np.asarray(got_dev), want)


def test_coder_threads_container_v2_roundtrip(tiny_codec, tmp_path):
    """Multithreaded (lane-sharded) coding: v2 file round-trips to exactly
    the v1 reconstruction, a v2 codec still reads v1 files, and the size
    overhead vs v1 is only the 6-byte magic + per-shard length words."""
    from hific_tpu.codec import Codec

    rng = np.random.RandomState(7)
    x = rng.rand(1, 80, 96, 3).astype(np.float32)

    threaded = Codec(tiny_codec.config, tiny_codec.params, coder_threads=4)
    threaded.factorized.tables = tiny_codec.factorized.tables
    threaded.factorized.medians = tiny_codec.factorized.medians
    threaded._tables_built = True

    p1 = os.path.join(tmp_path, "v1.hfc")
    p2 = os.path.join(tmp_path, "v2.hfc")
    tiny_codec.compress_file(x, p1)
    threaded.compress_file(x, p2)

    recon_v1 = tiny_codec.decompress_file(p1)
    recon_v2 = threaded.decompress_file(p2)
    np.testing.assert_array_equal(recon_v1, recon_v2)

    # v2 codec reads v1 files and vice versa (shardedness is in the file).
    np.testing.assert_array_equal(threaded.decompress_file(p1), recon_v1)
    np.testing.assert_array_equal(tiny_codec.decompress_file(p2), recon_v1)

    # 6-byte magic + (1 + K) uint32 header words per payload, K=4, 2 payloads.
    overhead = 6 + 2 * 4 * (1 + 4)
    assert os.path.getsize(p2) <= os.path.getsize(p1) + overhead


def test_device_decode_matches_host_path(tiny_codec, tmp_path):
    """On-device rANS decode == host decode, bit-exactly, through the full
    codec (file included); decompress_many takes the device path too."""
    rng = np.random.RandomState(9)
    x = rng.rand(1, 80, 96, 3).astype(np.float32)
    path = os.path.join(tmp_path, "dd.hfc")
    tiny_codec.compress_file(x, path)

    from hific_tpu.entropy.container import load_compressed

    out = load_compressed(path)
    host = tiny_codec.decompress(out, as_uint8=True, device_decode=False)
    dev = tiny_codec.decompress(out, as_uint8=True, device_decode=True)
    assert dev.dtype == np.uint8
    np.testing.assert_array_equal(host, dev)

    auto = tiny_codec.decompress(out, as_uint8=True)  # auto-selects device
    np.testing.assert_array_equal(host, auto)

    many = tiny_codec.decompress_many([out, out], as_uint8=True)
    np.testing.assert_array_equal(many[0], host)
    np.testing.assert_array_equal(many[1], host)


def test_uint8_ingestion_bitexact(tiny_codec, tmp_path):
    """compress(uint8 image) == compress(float image of the same pixels):
    identical bitstreams via the on-device normalize (the u8 upload is the
    preferred ingestion wire)."""
    rng = np.random.RandomState(11)
    x8 = rng.randint(0, 256, size=(1, 80, 96, 3), dtype=np.uint8)
    xf = x8.astype(np.float32) / 255.0

    out_f = tiny_codec.compress(xf)
    out_8 = tiny_codec.compress(x8)
    np.testing.assert_array_equal(out_f.hyperlatents_encoded,
                                  out_8.hyperlatents_encoded)
    np.testing.assert_array_equal(out_f.latents_encoded,
                                  out_8.latents_encoded)
    assert out_f.total_bpp == out_8.total_bpp

    outs = tiny_codec.compress_many([x8, xf], shape_bucket=32)
    np.testing.assert_array_equal(outs[0].latents_encoded,
                                  outs[1].latents_encoded)


def test_device_encode_matches_host_path(tiny_codec):
    """On-device entropy ENCODE == host coder through the full codec:
    byte-identical .hfc payloads, same bpp, and round-trips; compress_many
    takes the device path too."""
    rng = np.random.RandomState(13)
    x = rng.rand(1, 80, 96, 3).astype(np.float32)

    host = tiny_codec.compress(x, device_encode=False)
    dev = tiny_codec.compress(x, device_encode=True)
    np.testing.assert_array_equal(host.hyperlatents_encoded,
                                  dev.hyperlatents_encoded)
    np.testing.assert_array_equal(host.latents_encoded, dev.latents_encoded)
    assert abs(host.total_bpp - dev.total_bpp) < 1e-4
    assert host.hyperlatent_spatial_shape == dev.hyperlatent_spatial_shape
    assert host.latent_coding_shape == dev.latent_coding_shape

    # compress() defaults to the host coder; compress_many is what
    # auto-selects the device path (checked against `want8` below).
    auto = tiny_codec.compress(x)
    np.testing.assert_array_equal(auto.latents_encoded, host.latents_encoded)

    recon_h = tiny_codec.decompress(host, as_uint8=True)
    recon_d = tiny_codec.decompress(dev, as_uint8=True)
    np.testing.assert_array_equal(recon_h, recon_d)

    x8 = (x * 255 + 0.5).astype(np.uint8)
    outs = tiny_codec.compress_many([x8, x8], shape_bucket=32)
    np.testing.assert_array_equal(outs[0].latents_encoded,
                                  outs[1].latents_encoded)
    want8 = tiny_codec.compress(x8, shape_bucket=32, device_encode=False)
    np.testing.assert_array_equal(outs[0].latents_encoded,
                                  want8.latents_encoded)
