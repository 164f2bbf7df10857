"""Portable single-file params artifact (.npz): export / restore / CLI use.

The tpu-native analog of the reference's released `.pt` weights file
(src/README.md "Pretrained model weights"): one committed file restores a
servable model. Fast tier: exact round-trip + resolver semantics; slow
tier: CLI equivalence through the real compress pipeline.
"""

import os

import jax
import numpy as np
import pytest

from hific_tpu.config import hific_config, mse_lpips_config
from hific_tpu.training import checkpoints
from hific_tpu.training.train_step import create_train_state

TINY = dict(
    latent_channels=8,
    n_residual_blocks=1,
    hyperlatent_filters=16,
    crop_size=64,
    batch_size=2,
)


def _tiny_params():
    cfg = mse_lpips_config(**TINY)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    return cfg, state.params


def _leaves(params):
    flat = {}
    def walk(tree, prefix):
        for k in sorted(tree):
            v = tree[k]
            key = f"{prefix}/{k}" if prefix else str(k)
            if hasattr(v, "items"):
                walk(v, key)
            else:
                flat[key] = np.asarray(v)
    walk(params, "")
    return flat


def test_export_load_roundtrip_exact(tmp_path):
    cfg, params = _tiny_params()
    out = checkpoints.export_params_npz(str(tmp_path / "m.npz"), params, cfg)
    cfg2, params2 = checkpoints.load_params_npz(out)
    assert cfg2 == cfg
    a, b = _leaves(params), _leaves(params2)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
        assert a[k].dtype == b[k].dtype, k


def test_export_f16_halves_floats_and_restores_f32(tmp_path):
    cfg, params = _tiny_params()
    exact = checkpoints.export_params_npz(
        str(tmp_path / "f32.npz"), params, cfg)
    half = checkpoints.export_params_npz(
        str(tmp_path / "f16.npz"), params, cfg, cast_floats=np.float16)
    assert os.path.getsize(half) < 0.75 * os.path.getsize(exact)
    _, params2 = checkpoints.load_params_npz(half)
    for k, v in _leaves(params2).items():
        if np.issubdtype(v.dtype, np.floating):
            assert v.dtype == np.float32, k
    # values are the f16-rounded originals, exactly
    a, b = _leaves(params), _leaves(params2)
    for k in a:
        if np.issubdtype(a[k].dtype, np.floating):
            np.testing.assert_array_equal(
                a[k].astype(np.float16).astype(np.float32), b[k], err_msg=k)


def test_resolver_accepts_dir_and_npz(tmp_path):
    cfg, params = _tiny_params()
    npz = checkpoints.export_params_npz(str(tmp_path / "m.npz"), params, cfg)
    cfg_n, params_n = checkpoints.resolve_eval_checkpoint(npz)
    assert cfg_n == cfg
    a, b = _leaves(params), _leaves(params_n)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    with pytest.raises(FileNotFoundError):
        checkpoints.resolve_eval_checkpoint(str(tmp_path / "nothere"))


@pytest.mark.slow
def test_compress_cli_from_npz_matches_orbax_dir(tmp_path):
    """`-ckpt model.npz` produces byte-identical .hfc files to the Orbax
    directory it was exported from (exact export, no cast)."""
    from PIL import Image

    from hific_tpu.cli import compress as compress_cli
    from hific_tpu.cli import export_params as export_cli

    cfg = mse_lpips_config(**TINY)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    ckpt_dir = str(tmp_path / "ckpts")
    checkpoints.save_checkpoint(ckpt_dir, state, cfg)

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.RandomState(1)
    Image.fromarray(rng.randint(0, 256, (96, 128, 3), np.uint8)).save(
        str(img_dir / "a.png"))

    npz = export_cli.main(["-ckpt", ckpt_dir, "-o", str(tmp_path / "m.npz")])

    out_a = str(tmp_path / "out_dir")
    out_b = str(tmp_path / "out_npz")
    common = ["-i", str(img_dir), "--save", "--no_metrics"]
    compress_cli.main(["-ckpt", ckpt_dir, "-o", out_a] + common)
    compress_cli.main(["-ckpt", npz, "-o", out_b] + common)

    hfc_a = [f for f in sorted(os.listdir(out_a)) if f.endswith(".hfc")]
    hfc_b = [f for f in sorted(os.listdir(out_b)) if f.endswith(".hfc")]
    assert hfc_a and hfc_a == hfc_b
    for f in hfc_a:
        with open(os.path.join(out_a, f), "rb") as fa, \
             open(os.path.join(out_b, f), "rb") as fb:
            assert fa.read() == fb.read(), f
