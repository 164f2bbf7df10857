"""convert CLI end to end: synthetic reference .pt -> orbax -> compress."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.mark.slow
def test_convert_cli_roundtrip(tmp_path):
    from tests.test_convert_torch import _synthetic_reference_state_dict
    from hific_tpu.cli import convert as convert_cli

    sd = _synthetic_reference_state_dict(C=8, N=16, n_res=1, gan=True)
    pt_path = str(tmp_path / "ref_ckpt.pt")
    torch.save({"model_state_dict": {k: torch.tensor(v) for k, v in sd.items()},
                "args": {"regime": "low"}}, pt_path)

    out_dir = str(tmp_path / "converted")
    path = convert_cli.main([
        "-pt", pt_path, "-o", out_dir,
        "--model_type", "compression_gan", "--regime", "low",
        "--latent_channels", "8", "--n_residual_blocks", "1",
        "--hyperlatent_filters", "16",
    ])
    assert os.path.exists(path)

    # The converted checkpoint drives the codec.
    import jax

    from hific_tpu.codec import Codec
    from hific_tpu.training import checkpoints

    config = checkpoints.load_config(out_dir)
    params = checkpoints.restore_params(path, config, jax.random.PRNGKey(0))
    codec = Codec(config, params)
    x = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
    out = codec.compress(x)
    recon = codec.decompress(out)
    assert recon.shape == (1, 64, 64, 3)
    assert np.isfinite(out.total_bpp) and out.total_bpp > 0
