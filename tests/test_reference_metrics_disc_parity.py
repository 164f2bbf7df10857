"""Parity vs the reference for the two remaining unchecked numerics
(VERDICT r1 weak #4/#5): the MS-SSIM metric (north-star numbers are stated
in it) and the converted discriminator stack including spectral-norm
u-state (GAN warmstart from reference checkpoints).
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


@pytest.fixture(scope="module")
def ref():
    import types

    from ref_stubs import install_reference_stubs

    install_reference_stubs()
    sys.path.insert(0, REFERENCE)
    try:
        from src.helpers import metrics as r_metrics
        from src.network import discriminator as r_discriminator
        from src.network import encoder as r_encoder
        from src.network import generator as r_generator
        from src import hyperprior as r_hyperprior
    finally:
        sys.path.remove(REFERENCE)
    return types.SimpleNamespace(metrics=r_metrics,
                                 discriminator=r_discriminator,
                                 encoder=r_encoder, generator=r_generator,
                                 hyperprior=r_hyperprior)


def _image_pair(h=192, w=192, n=2, seed=0):
    """Structured (natural-spectrum-ish) image pairs in [0,1]: MS-SSIM on
    white noise is degenerate."""
    rng = np.random.RandomState(seed)
    base = rng.rand(n, h // 16, w // 16, 3).astype(np.float32)
    x = np.stack([np.kron(b, np.ones((16, 16, 1))) for b in base])[0:n]
    x = x.reshape(n, h, w, 3)
    x = x + 0.1 * rng.rand(n, h, w, 3).astype(np.float32)
    x = np.clip(x, 0, 1).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.03, x.shape), 0, 1).astype(np.float32)
    return x, y


def test_ms_ssim_parity(ref):
    """Our jittable MS-SSIM == the reference torch implementation
    (metrics.py:164-237) to 1e-4 on real-image-like pairs."""
    from hific_tpu.utils.metrics import ms_ssim

    x, y = _image_pair()
    want = ref.metrics.ms_ssim(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(y.transpose(0, 3, 1, 2)),
        data_range=1.0, size_average=False).numpy()
    got = np.asarray(ms_ssim(x, y, max_val=1.0)).reshape(-1)
    np.testing.assert_allclose(got, want.reshape(-1), atol=1e-4)

    # identical images -> 1
    ones = np.asarray(ms_ssim(x, x, max_val=1.0)).reshape(-1)
    np.testing.assert_allclose(ones, 1.0, atol=1e-5)


def test_ssim_parity(ref):
    from hific_tpu.utils.metrics import ssim

    x, y = _image_pair(h=96, w=96, seed=1)
    want = ref.metrics.ssim(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(y.transpose(0, 3, 1, 2)),
        data_range=1.0, size_average=False).numpy()
    got = np.asarray(ssim(x, y, max_val=1.0)).reshape(-1)
    np.testing.assert_allclose(got, want.reshape(-1), atol=1e-4)


def test_converted_discriminator_full_stack_parity(ref):
    """Full tiny reference model -> convert_state_dict -> our Discriminator:
    logits match the reference in TRAIN mode (one power-iteration step from
    the converted u, exactly torch's update order:
    v=norm(W^T u), u'=norm(W v), sigma=u'.(W v)), and the updated u-state
    matches torch's stored weight_u afterwards."""
    import jax.numpy as jnp

    from hific_tpu.models.discriminator import Discriminator
    from hific_tpu.utils.convert_torch import convert_state_dict

    torch.manual_seed(5)
    C, N, n_res = 4, 8, 1
    r_enc = ref.encoder.Encoder(image_dims=(3, 64, 64), batch_size=1, C=C)
    r_gen = ref.generator.Generator(input_dims=(C, 4, 4), batch_size=1, C=C,
                                    n_residual_blocks=n_res)
    r_hyp = ref.hyperprior.Hyperprior(bottleneck_capacity=C,
                                      hyperlatent_filters=N)
    r_disc = ref.discriminator.Discriminator(image_dims=(3, 64, 64),
                                             context_dims=(C, 4, 4), C=C)

    sd = {}
    for prefix, mod in [("Encoder", r_enc), ("Generator", r_gen),
                        ("Hyperprior", r_hyp), ("Discriminator", r_disc)]:
        sd.update({f"{prefix}.{k}": v for k, v in mod.state_dict().items()})

    # Convert BEFORE the torch forward: captures the pre-update u the same
    # way a saved checkpoint would.
    params, disc_params, spectral = convert_state_dict(
        sd, n_residual_blocks=n_res)
    assert spectral, "converter produced no spectral-norm state"

    x = torch.rand(2, 3, 64, 64) * 2 - 1
    y = torch.randn(2, C, 4, 4)
    r_disc.train()
    with torch.no_grad():
        want_out, want_logits = r_disc(x, y)

    disc = Discriminator()
    variables = {"params": disc_params, "spectral": spectral}
    (got_out, got_logits), mutated = disc.apply(
        variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(y.numpy().transpose(0, 2, 3, 1)),
        update_stats=True, mutable=["spectral"])

    np.testing.assert_allclose(
        np.asarray(got_logits).reshape(-1), want_logits.numpy().reshape(-1),
        atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(got_out).reshape(-1), want_out.numpy().reshape(-1),
        atol=2e-4)

    # the power-iteration state advanced exactly as torch's
    sd_after = r_disc.state_dict()
    for i in (1, 2, 3, 4):
        np.testing.assert_allclose(
            np.asarray(mutated["spectral"][f"conv{i}"]["u"]),
            sd_after[f"conv{i}.weight_u"].numpy(), atol=1e-5,
            err_msg=f"conv{i} u-state")
