"""Container-level bitstream interop: the COMPLETE `.hfc` path vs the
reference, with shared trained weights.

Closes the last unproven link in "bitwise-compatible round-trip"
(VERDICT r1 #3): the same (converted) hyperprior weights drive BOTH stacks
end to end — reference `compress_forward` + `save_compressed_format`
(hyperprior.py:195-246, compression_utils.py:300-371) vs our entropy
models + container — checking

  1. independently-built probability tables agree (exactly-equal
     lengths/offsets; CDF entries equal up to the unavoidable +-1
     quantization-boundary flips between float stacks),
  2. under PINNED tables (sender's tables imported by the receiver — the
     deployment contract; torch-CPU vs torch-GPU floats differ too), the
     two frameworks write BYTE-IDENTICAL `.hfc` files and each decodes the
     other's file to identical symbols/latents.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "src")),
    reason="reference tree not mounted")

torch = pytest.importorskip("torch")

C, N = 6, 8  # tiny latent/hyperlatent channels


@pytest.fixture(scope="module")
def ref():
    from ref_stubs import install_reference_stubs

    install_reference_stubs()
    sys.path.insert(0, REFERENCE)
    try:
        from src import hyperprior as r_hyperprior
        from src.compression import compression_utils as r_cu
    finally:
        sys.path.remove(REFERENCE)

    # The reference casts its CDF tables to uint32 (hyperprior_model.py:179,
    # prior_model.py:192) whose renormalization products overflow under
    # numpy>=2 NEP-50 promotion. Re-cast to uint64 at its coder entry
    # points — numerically transparent (the values are < 2^16).
    if not getattr(r_cu, "_u64_patched", False):
        orig_compress, orig_decompress = r_cu.ans_compress, r_cu.ans_decompress

        def _compress64(symbols, indices, cdf, *args, **kw):
            return orig_compress(symbols, indices, cdf.astype(np.uint64),
                                 *args, **kw)

        def _decompress64(encoded, indices, cdf, *args, **kw):
            return orig_decompress(encoded, indices, cdf.astype(np.uint64),
                                   *args, **kw)

        r_cu.ans_compress = _compress64
        r_cu.ans_decompress = _decompress64
        r_cu._u64_patched = True
    return r_hyperprior, r_cu


@pytest.fixture(scope="module")
def ref_hp(ref):
    r_hyperprior, _ = ref
    torch.manual_seed(3)
    hp = r_hyperprior.Hyperprior(bottleneck_capacity=C,
                                 hyperlatent_filters=N, entropy_code=True)
    hp.eval()
    hp.hyperprior_entropy_model.build_tables()
    return hp


@pytest.fixture(scope="module")
def ours(ref_hp):
    """Our entropy models + device fns bound to the CONVERTED weights."""
    import jax
    import types

    from ref_helpers import convert_ref_hyperprior_state
    from hific_tpu.entropy.entropy_models import (
        ConditionalEntropyModel,
        FactorizedEntropyModel,
    )
    from hific_tpu.models.density import HyperlatentDensity
    from hific_tpu.models.hyperprior import Hyperprior as OurHyperprior

    p = convert_ref_hyperprior_state(ref_hp.state_dict())
    hp = OurHyperprior(C=C, hyperlatent_filters=N)
    dens = HyperlatentDensity(n_channels=N)
    dp = {"params": p["hyperlatent_density"]}
    factorized = FactorizedEntropyModel(
        lambda t: dens.apply(dp, t, stop_gradient=True,
                             method=HyperlatentDensity.cdf_logits),
        jax.jit(lambda t: dens.apply(
            dp, t, method=HyperlatentDensity.likelihood_collapsed)),
        n_channels=N)
    factorized.build_tables()
    conditional = ConditionalEntropyModel("gaussian")
    return types.SimpleNamespace(params=p, module=hp, factorized=factorized,
                                 conditional=conditional)


def _table_close(name, ours_t, want_cdf, want_len, want_off):
    """Independently-built tables: structure exact, CDF entries equal up to
    +-1 at pmf-rounding boundaries (torch vs XLA float32)."""
    np.testing.assert_array_equal(ours_t.cdf_length, want_len, err_msg=name)
    np.testing.assert_array_equal(ours_t.cdf_offset, want_off, err_msg=name)
    got = ours_t.cdf.astype(np.int64)
    want = np.zeros_like(got)
    want[:, : want_cdf.shape[1]] = want_cdf.astype(np.int64)
    diff = np.abs(got - want)
    assert diff.max() <= 1, f"{name}: CDF entries differ by >1"
    frac = (diff > 0).mean()
    assert frac < 0.05, f"{name}: {frac:.1%} of CDF entries flipped"


def test_independent_table_build_parity(ref_hp, ours):
    _table_close("hyper",
                 ours.factorized.tables,
                 ref_hp.hyperprior_entropy_model.CDF.numpy(),
                 ref_hp.hyperprior_entropy_model.CDF_length.numpy(),
                 ref_hp.hyperprior_entropy_model.CDF_offset.numpy())
    _table_close("prior",
                 ours.conditional.tables,
                 ref_hp.prior_entropy_model.CDF.numpy(),
                 ref_hp.prior_entropy_model.CDF_length.numpy(),
                 ref_hp.prior_entropy_model.CDF_offset.numpy())
    np.testing.assert_allclose(
        ours.conditional.scale_table,
        np.asarray(ref_hp.prior_entropy_model.scale_table_tensor),
        rtol=1e-5)


@pytest.fixture(scope="module")
def pinned(ref_hp, ours):
    """Import the reference's tables into our models (the deployment
    contract: one table build, shared by coder and decoder)."""
    ours.factorized.import_tables(
        ref_hp.hyperprior_entropy_model.CDF.numpy(),
        ref_hp.hyperprior_entropy_model.CDF_length.numpy(),
        ref_hp.hyperprior_entropy_model.CDF_offset.numpy())
    ours.conditional.import_tables(
        ref_hp.prior_entropy_model.CDF.numpy(),
        ref_hp.prior_entropy_model.CDF_length.numpy(),
        ref_hp.prior_entropy_model.CDF_offset.numpy())
    return ours


def _our_compress(pinned, y_nhwc, spatial_shape):
    """Our host-side codec path on explicit latents (the codec's device
    programs, minus the image-space encoder which has its own parity
    tests)."""
    import jax.numpy as jnp

    from hific_tpu.entropy.container import CompressionOutput
    from hific_tpu.entropy.tables import compute_scale_indices
    from hific_tpu.models.hyperprior import Hyperprior as OurHyperprior

    p = {"params": pinned.params}
    z = pinned.module.apply(p, jnp.asarray(y_nhwc),
                            method=OurHyperprior.analyze)
    z_sym = np.floor(np.asarray(z, np.float32) + 0.5).astype(np.int32)
    z_np = z_sym.transpose(0, 3, 1, 2)

    z_enc, hyper_cs = pinned.factorized.compress_symbols(z_np)
    # decode own hyperlatents (the determinism invariant)
    z_dec = pinned.factorized.decompress_symbols(
        z_enc, z_np.shape[0], z_np.shape[2:])
    mu, sigma = pinned.module.apply(
        p, jnp.asarray(z_dec.transpose(0, 2, 3, 1), jnp.float32),
        method=OurHyperprior.synthesize)
    mu = np.asarray(mu, np.float32)
    sigma = np.asarray(sigma, np.float32)
    y_sym = np.floor(np.asarray(y_nhwc) + 0.5 - mu).astype(np.int32)
    idx = compute_scale_indices(sigma, pinned.conditional.scale_table)

    y_enc, lat_cs = pinned.conditional.compress_symbols(
        y_sym.transpose(0, 3, 1, 2), idx.transpose(0, 3, 1, 2))
    return CompressionOutput(
        hyperlatents_encoded=z_enc, latents_encoded=y_enc,
        hyperlatent_spatial_shape=tuple(z_np.shape[2:]),
        spatial_shape=tuple(spatial_shape),
        hyper_coding_shape=tuple(hyper_cs), latent_coding_shape=tuple(lat_cs),
        batch_shape=z_np.shape[0],
        hyperlatent_bits=0.0, latent_bits=0.0, total_bits=0.0,
        hyperlatent_bpp=0.0, latent_bpp=0.0, total_bpp=0.0,
    ), z_np, y_sym.transpose(0, 3, 1, 2), idx.transpose(0, 3, 1, 2), mu


def test_container_cross_decode_bitexact(ref, ref_hp, pinned, tmp_path):
    """Both directions, full file path, byte-identical."""
    _, r_cu = ref
    from hific_tpu.entropy.container import load_compressed, save_compressed

    torch.manual_seed(7)
    y_t = (torch.randn(1, C, 16, 16) * 2.0).round_(
    ) * 0.5 + torch.randn(1, C, 16, 16) * 0.3
    spatial = (256, 256)

    with torch.no_grad():
        ref_out = ref_hp.compress_forward(y_t, spatial_shape=spatial)
    ref_path = str(tmp_path / "ref.hfc")
    r_cu.save_compressed_format(ref_out, ref_path)

    y_nhwc = y_t.numpy().transpose(0, 2, 3, 1)
    our_out, z_np, y_sym, idx, mu = _our_compress(pinned, y_nhwc, spatial)
    our_path = str(tmp_path / "ours.hfc")
    save_compressed(our_out, our_path)

    with open(ref_path, "rb") as f:
        ref_bytes = f.read()
    with open(our_path, "rb") as f:
        our_bytes = f.read()
    assert ref_bytes == our_bytes, (
        f"container files differ: {len(ref_bytes)} vs {len(our_bytes)} bytes")

    # we decode the REFERENCE's file to identical symbols
    loaded = load_compressed(ref_path)
    z_dec = pinned.factorized.decompress_symbols(
        loaded.hyperlatents_encoded, loaded.batch_shape,
        loaded.hyperlatent_spatial_shape)
    np.testing.assert_array_equal(z_dec, z_np)
    y_dec = pinned.conditional.decompress_symbols(loaded.latents_encoded, idx)
    np.testing.assert_array_equal(y_dec, y_sym)
    ours_latents = y_dec.astype(np.float32) + mu.transpose(0, 3, 1, 2)

    # the reference decodes OUR file to its own decompress_forward output
    with torch.no_grad():
        ref_loaded = r_cu.load_compressed_format(our_path)
        ref_latents = ref_hp.decompress_forward(ref_loaded, device="cpu")
        ref_latents_own = ref_hp.decompress_forward(
            r_cu.load_compressed_format(ref_path), device="cpu")
    np.testing.assert_array_equal(ref_latents.numpy(),
                                  ref_latents_own.numpy())
    # and cross-stack decoded latents agree to float tolerance (means come
    # from each stack's own synthesis conv)
    np.testing.assert_allclose(ours_latents, ref_latents.numpy(), atol=2e-4)
