"""TOP-LEVEL cross-framework parity: reference `Model.compress()` /
`Model.decompress()` vs the hific_tpu `Codec`, full image -> `.hfc` ->
image loop on a real CLIC crop with shared (converted) weights.

Closes VERDICT r2 missing #1 — the last unproven link above the
module-level and container-level parity tests: one set of weights drives
BOTH complete stacks (reference src/model.py:262-344 incl. its pad_factor
calls and hyperprior.py:195-274; our codec.py compress/decompress), and we
check

  1. the two frameworks write BYTE-IDENTICAL `.hfc` files for the same
     image (pinned tables — the deployment contract, as in
     test_reference_container_interop.py),
  2. each stack decodes the OTHER's file: our decoder on the reference's
     bytes matches the reference's own reconstruction (and vice versa)
     within a float-stack tolerance, and to the pixel at uint8 +-1,
  3. the quantization margins are wide enough that the byte equality is
     robust, not lucky: every pre-round value sits > 1e-3 away from its
     rounding boundary relative to the measured cross-stack float drift
     (so no symbol can flip between torch-CPU and XLA-CPU floats).

The image is a real photograph crop (reference assets), at a size
(150x120) that exercises BOTH padding stages (image -> x16, latents ->
x4), since padding asymmetries are exactly where translations go wrong.
"""

import logging
import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(os.path.join(REFERENCE, "src")),
                       reason="reference tree not mounted"),
]

torch = pytest.importorskip("torch")

C_Y = 12        # latent channels (reference Model passes this to Encoder)
N_RES = 1       # residual blocks
H, W = 150, 120  # -> image padded to 160x128, latents 10x8 padded to 12x8


@pytest.fixture(scope="module")
def ref_modules():
    from ref_stubs import install_reference_stubs

    install_reference_stubs()
    sys.path.insert(0, REFERENCE)
    try:
        from src import model as r_model
        from src.compression import compression_utils as r_cu
        from src.helpers import utils as r_utils
    finally:
        sys.path.remove(REFERENCE)

    # numpy>=2 NEP-50: the reference's uint32 CDF tables overflow inside its
    # coder's renormalization products; recast at the coder boundary
    # (numerically transparent, values < 2^16). Same patch as
    # test_reference_container_interop.py.
    if not getattr(r_cu, "_u64_patched", False):
        orig_c, orig_d = r_cu.ans_compress, r_cu.ans_decompress
        r_cu.ans_compress = lambda s, i, cdf, *a, **k: orig_c(
            s, i, cdf.astype(np.uint64), *a, **k)
        r_cu.ans_decompress = lambda e, i, cdf, *a, **k: orig_d(
            e, i, cdf.astype(np.uint64), *a, **k)
        r_cu._u64_patched = True
    return r_model, r_cu, r_utils


def _ref_args():
    """Evaluation-mode arg bag (reference default_config.py values, shrunk
    to a tiny-but-complete model)."""
    return types.SimpleNamespace(
        log_interval=1000,
        use_latent_mixture_model=False,
        image_dims=(3, 256, 256),
        batch_size=1,
        latent_channels=C_Y,
        n_residual_blocks=N_RES,
        use_channel_norm=True,
        sample_noise=False,
        noise_dim=32,
        likelihood_type="gaussian",
        normalize_input_image=False,
        gpu=0,
    )


@pytest.fixture(scope="module")
def ref_model(ref_modules, monkeypatch_module):
    r_model, _, _ = ref_modules
    # The reference Model unconditionally instantiates LPIPS (model.py:105),
    # which pulls a torchvision pretrained backbone — absent in this env and
    # irrelevant to compress/decompress. Stub it for construction only.
    monkeypatch_module.setattr(
        r_model.ps, "PerceptualLoss", lambda **kw: torch.nn.Identity())
    torch.manual_seed(11)
    m = r_model.Model(_ref_args(), logging.getLogger("ref_e2e"),
                      model_mode=r_model.ModelModes.EVALUATION,
                      model_type=r_model.ModelTypes.COMPRESSION)
    m.eval()
    m.Hyperprior.hyperprior_entropy_model.build_tables()
    return m


@pytest.fixture(scope="module")
def monkeypatch_module():
    mp = pytest.MonkeyPatch()
    yield mp
    mp.undo()


@pytest.fixture(scope="module")
def our_codec(ref_model):
    """Codec on the CONVERTED weights, coding against the reference's
    tables (pinned: one table build shared by sender and receiver)."""
    import jax

    from hific_tpu.codec import Codec
    from hific_tpu.config import mse_lpips_config
    from hific_tpu.utils.convert_torch import convert_state_dict

    params, _, _ = convert_state_dict(
        {k: np.array(v.detach().numpy())
         for k, v in ref_model.state_dict().items()
         if not k.startswith("perceptual_loss")},
        n_residual_blocks=N_RES)
    config = mse_lpips_config(latent_channels=C_Y, n_residual_blocks=N_RES)
    codec = Codec(config,
                  jax.tree_util.tree_map(np.asarray, params))
    hem = ref_model.Hyperprior.hyperprior_entropy_model
    pem = ref_model.Hyperprior.prior_entropy_model
    codec.factorized.import_tables(hem.CDF.numpy(), hem.CDF_length.numpy(),
                                   hem.CDF_offset.numpy())
    codec.conditional.import_tables(pem.CDF.numpy(), pem.CDF_length.numpy(),
                                    pem.CDF_offset.numpy())
    codec._tables_built = True
    return codec


@pytest.fixture(scope="module")
def image():
    """Real photograph crop, float32 [0,1], deliberately NOT a multiple of
    16 in either dimension."""
    from PIL import Image

    path = os.path.join(REFERENCE, "assets/originals/CLIC2020_18.png")
    img = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
    crop = img[200 : 200 + H, 300 : 300 + W]
    assert crop.shape == (H, W, 3)
    return crop[None]  # NHWC


def _ref_roundtrip(ref_model, r_cu, x_nhwc, path):
    xt = torch.tensor(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))
    with torch.no_grad():
        out = ref_model.compress(xt, silent=True)
        r_cu.save_compressed_format(out, path)
        recon = ref_model.decompress(r_cu.load_compressed_format(path))
    return out, recon.numpy().transpose(0, 2, 3, 1)


def test_e2e_cross_framework_parity(ref_modules, ref_model, our_codec,
                                    image, tmp_path):
    from hific_tpu.entropy.container import load_compressed, save_compressed

    _, r_cu, _ = ref_modules
    ref_path = str(tmp_path / "ref.hfc")
    our_path = str(tmp_path / "ours.hfc")

    # --- both stacks compress the same image --------------------------- #
    ref_out, ref_recon = _ref_roundtrip(ref_model, r_cu, image, ref_path)
    our_out = our_codec.compress(image)
    save_compressed(our_out, our_path)

    with open(ref_path, "rb") as f:
        ref_bytes = f.read()
    with open(our_path, "rb") as f:
        our_bytes = f.read()
    assert ref_bytes == our_bytes, (
        f"`.hfc` files differ ({len(ref_bytes)} vs {len(our_bytes)} bytes): "
        "a symbol flipped between the torch and XLA float stacks")

    # rate bookkeeping agrees (the estimates ride the same likelihoods)
    assert abs(float(ref_out.total_bpp) - our_out.total_bpp) < 1e-3

    # --- we decode the REFERENCE's file -------------------------------- #
    our_recon = np.asarray(our_codec.decompress(load_compressed(ref_path)))
    assert our_recon.shape == ref_recon.shape == (1, H, W, 3)
    # Identical symbols went in (bytes matched), so this bounds the
    # generator-stack float divergence only.
    diff = np.abs(our_recon - ref_recon).max()
    assert diff < 1e-3, f"reconstruction diff {diff}"
    u8_ours = np.clip(our_recon * 255 + 0.5, 0, 255).astype(np.uint8)
    u8_ref = np.clip(ref_recon * 255 + 0.5, 0, 255).astype(np.uint8)
    assert np.abs(u8_ours.astype(int) - u8_ref.astype(int)).max() <= 1

    # --- the reference decodes OUR file -------------------------------- #
    with torch.no_grad():
        ref_recon_of_ours = ref_model.decompress(
            r_cu.load_compressed_format(our_path)).numpy().transpose(
                0, 2, 3, 1)
    np.testing.assert_array_equal(ref_recon_of_ours, ref_recon)


def test_quantization_margins_are_robust(ref_modules, ref_model, our_codec,
                                         image):
    """The byte equality above is only meaningful if it cannot flip under
    float jitter: measure the actual cross-stack drift of every pre-round
    quantity and the distance of each to its rounding boundary."""
    import jax.numpy as jnp

    from hific_tpu.models.hific import HiFiC

    r_utils = ref_modules[2]
    xt = torch.tensor(np.ascontiguousarray(image.transpose(0, 3, 1, 2)))
    with torch.no_grad():
        xp = r_utils.pad_factor(xt, xt.size()[2:], 16)
        y_t = ref_model.Encoder(xp)
        y_t = r_utils.pad_factor(y_t, y_t.size()[2:], 4)
        z_t = ref_model.Hyperprior.analysis_net(y_t)
        z_round = torch.floor(z_t + 0.5)
        mu_t = ref_model.Hyperprior.synthesis_mu(z_round)

    y_ours = np.asarray(our_codec._encode(jnp.asarray(image))[0])
    z_ours = np.asarray(our_codec._hyper_analyze(jnp.asarray(y_ours)))

    y_ref = y_t.numpy().transpose(0, 2, 3, 1)
    z_ref = z_t.numpy().transpose(0, 2, 3, 1)
    drift = max(np.abs(y_ours - y_ref).max(), np.abs(z_ours - z_ref).max())

    def margin(v):  # distance to the nearest floor(v + 0.5) boundary
        return np.abs(v + 0.5 - np.round(v + 0.5)).min()

    m = min(margin(z_t.numpy()),
            margin((y_t - mu_t).numpy()))
    assert drift < 1e-4, f"cross-stack float drift {drift:.2e}"
    assert m > 10 * drift, (
        f"quantization margin {m:.2e} too close to drift {drift:.2e}: "
        "byte equality would be luck, not robustness")
