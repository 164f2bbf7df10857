import os

import jax.numpy as jnp
import numpy as np
import pytest

from hific_tpu.utils.metrics import ms_ssim, psnr, ssim


def test_psnr_matches_definition():
    rng = np.random.RandomState(0)
    a = rng.rand(2, 32, 32, 3).astype(np.float32)
    b = np.clip(a + rng.randn(2, 32, 32, 3).astype(np.float32) * 0.05, 0, 1)
    got = np.asarray(psnr(jnp.asarray(a), jnp.asarray(b)))
    mse = ((a - b) ** 2).mean(axis=(1, 2, 3))
    want = -10 * np.log10(mse)
    np.testing.assert_allclose(got, want, rtol=1e-4)
    assert np.isposinf(np.asarray(psnr(jnp.asarray(a), jnp.asarray(a)))).all() or \
        np.all(np.asarray(psnr(jnp.asarray(a), jnp.asarray(a))) > 80)


def test_ssim_identity_and_ordering():
    rng = np.random.RandomState(1)
    a = rng.rand(1, 64, 64, 3).astype(np.float32)
    np.testing.assert_allclose(np.asarray(ssim(jnp.asarray(a), jnp.asarray(a))),
                               1.0, atol=1e-5)
    small = np.clip(a + rng.randn(*a.shape).astype(np.float32) * 0.02, 0, 1)
    big = np.clip(a + rng.randn(*a.shape).astype(np.float32) * 0.2, 0, 1)
    s_small = float(ssim(jnp.asarray(a), jnp.asarray(small))[0])
    s_big = float(ssim(jnp.asarray(a), jnp.asarray(big))[0])
    assert s_small > s_big


def test_ssim_matches_torch_reference_style():
    """Compare against skimage-style SSIM computed with scipy (independent
    oracle using gaussian windows)."""
    pytest.importorskip("scipy")
    from scipy.ndimage import gaussian_filter

    rng = np.random.RandomState(2)
    a = rng.rand(48, 48).astype(np.float64)
    b = np.clip(a + rng.randn(48, 48) * 0.1, 0, 1)

    # truncate=3.5 gives an 11-tap window for sigma=1.5
    def blur(x):
        return gaussian_filter(x, 1.5, truncate=3.5, mode="constant")

    # Our implementation uses VALID conv; compare interior region only.
    mu_a, mu_b = blur(a), blur(b)
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    sigma_aa = blur(a * a) - mu_a ** 2
    sigma_bb = blur(b * b) - mu_b ** 2
    sigma_ab = blur(a * b) - mu_a * mu_b
    ssim_map = ((2 * mu_a * mu_b + c1) * (2 * sigma_ab + c2)) / (
        (mu_a ** 2 + mu_b ** 2 + c1) * (sigma_aa + sigma_bb + c2))
    want = ssim_map[5:-5, 5:-5].mean()

    got = float(ssim(jnp.asarray(a[None, :, :, None], jnp.float32),
                     jnp.asarray(b[None, :, :, None], jnp.float32))[0])
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_ms_ssim_range_and_identity():
    rng = np.random.RandomState(3)
    a = rng.rand(1, 192, 192, 3).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(ms_ssim(jnp.asarray(a), jnp.asarray(a))), 1.0, atol=1e-4)
    noisy = np.clip(a + rng.randn(*a.shape).astype(np.float32) * 0.1, 0, 1)
    v = float(ms_ssim(jnp.asarray(a), jnp.asarray(noisy))[0])
    assert 0 < v < 1


@pytest.fixture()
def image_dir(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(0)
    for i, hw in enumerate([(300, 400), (280, 300), (512, 300)]):
        arr = (rng.rand(*hw, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / f"img_{i}.png")
    # one corrupt file, must be skipped
    (tmp_path / "bad.jpg").write_bytes(b"not an image")
    return str(tmp_path)


def test_train_dataset(image_dir):
    from hific_tpu.training.data import TrainDataset, prefetch

    ds = TrainDataset(image_dir, crop_size=128, seed=0)
    it = prefetch(ds.batches(4), size=2)
    x, bpp = next(it)
    assert x.shape == (4, 128, 128, 3)
    assert x.dtype == np.float32 and 0 <= x.min() and x.max() <= 1
    assert bpp.shape == (4,) and (bpp > 0).all()


def test_eval_dataset(image_dir):
    from hific_tpu.training.data import EvalDataset

    ds = EvalDataset(image_dir)
    items = list(ds)
    assert len(items) == 3  # corrupt file skipped
    x, bpp, path = items[0]
    assert x.ndim == 4 and x.shape[0] == 1 and x.shape[-1] == 3
    assert bpp > 0 and os.path.exists(path)


def test_ms_ssim_bounded_and_dtype_robust():
    """MS-SSIM is a METRIC: it must stay <= 1 regardless of the compute
    dtype the surrounding pipeline runs in. Regression for a real bug: on
    TPU the default conv precision is bfloat16, which inflated MS-SSIM by
    up to +0.13 on real images (values > 1) until the windows were pinned
    to HIGHEST precision; bf16 INPUTS must also be handled (cast to f32
    internally), since training-eval reconstructions arrive in the model
    dtype."""
    import jax.numpy as jnp

    from hific_tpu.utils.metrics import ms_ssim

    rng = np.random.RandomState(7)
    a = rng.rand(1, 192, 224, 3).astype(np.float32)
    b = np.clip(a + rng.randn(1, 192, 224, 3).astype(np.float32) * 0.05,
                0, 1)
    v32 = float(np.asarray(ms_ssim(jnp.asarray(a), jnp.asarray(b)))[0])
    assert 0.0 < v32 <= 1.0 + 1e-6
    v16 = float(np.asarray(ms_ssim(jnp.asarray(a, jnp.bfloat16),
                                   jnp.asarray(b, jnp.bfloat16)))[0])
    assert abs(v16 - v32) < 5e-3  # input quantization only, not compute
    assert np.asarray(ms_ssim(jnp.asarray(a), jnp.asarray(b))).dtype == \
        np.float32
