"""Device-resident dataset + uint8 batch ingestion (the zero-upload /
low-upload training input paths; see PERF.md round 3b on why per-step
uploads are poison on the tunneled transport)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hific_tpu.config import mse_lpips_config
from hific_tpu.training.data import DeviceDataset, TrainDataset
from hific_tpu.training.train_step import (create_train_state, ingest_batch,
                                           make_train_step_g)

TINY = dict(latent_channels=8, n_residual_blocks=1, hyperlatent_filters=16)


@pytest.fixture()
def tile_dir(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(0)
    d = tmp_path / "tiles"
    d.mkdir()
    for i in range(5):
        arr = (rng.rand(40, 40, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"tile_{i}.png")
    return str(d)


def test_device_dataset_batches(tile_dir):
    ds = DeviceDataset(tile_dir, crop_size=32, batch_size=4, seed=0)
    assert ds.data.shape == (5, 40, 40, 3) and ds.data.dtype == jnp.uint8

    it = ds.batches()
    x0, bpp0 = next(it)
    x1, _ = next(it)
    assert x0.shape == (4, 32, 32, 3) and x0.dtype == jnp.float32
    assert isinstance(x0, jax.Array)  # device-resident, no host round trip
    assert float(x0.min()) >= 0.0 and float(x0.max()) <= 1.0
    assert bpp0.shape == (4,)
    # consecutive batches differ (fresh fold_in key per draw)
    assert not np.array_equal(np.asarray(x0), np.asarray(x1))
    # every crop is an actual window of some source tile
    src = np.asarray(ds.data).astype(np.float32) / 255.0
    crop = np.asarray(x0[0])
    # XLA computes /255 as multiply-by-reciprocal -> 1-ulp vs numpy
    found = any(
        np.abs(maybe[y : y + 32, x : x + 32] - crop).max() < 1e-6
        for tile in src
        for maybe in (tile, tile[:, ::-1])
        for y in range(9)
        for x in range(9)
    )
    assert found, "crop is not a window of any source tile (or its flip)"


def test_device_dataset_determinism(tile_dir):
    a = next(DeviceDataset(tile_dir, crop_size=32, batch_size=4,
                           seed=7).batches())[0]
    b = next(DeviceDataset(tile_dir, crop_size=32, batch_size=4,
                           seed=7).batches())[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_device_dataset_rejects_mixed_sizes(tmp_path, tile_dir):
    from PIL import Image

    odd = tmp_path / "tiles" / "odd.png"
    Image.fromarray(np.zeros((48, 40, 3), np.uint8)).save(odd)
    with pytest.raises(ValueError, match="uniformly-sized"):
        DeviceDataset(str(tmp_path / "tiles"), crop_size=32, batch_size=2)


def test_device_dataset_data_parallel_mesh(tile_dir):
    """With a mesh, the corpus replicates and the sampled batch comes out
    sharded over all mesh axes (matching shard_batch) with the SAME values
    the unsharded sampler draws for the same seed."""
    from hific_tpu.parallel.mesh import batch_sharding, make_mesh

    mesh = make_mesh()
    ds = DeviceDataset(tile_dir, crop_size=32, batch_size=8, seed=5,
                       mesh=mesh)
    x, _ = next(ds.batches())
    assert x.shape == (8, 32, 32, 3)
    assert x.sharding.is_equivalent_to(batch_sharding(mesh), x.ndim)

    ref = DeviceDataset(tile_dir, crop_size=32, batch_size=8, seed=5)
    want = np.asarray(next(ref.batches())[0])
    np.testing.assert_array_equal(np.asarray(x), want)

    with pytest.raises(ValueError, match="not divisible"):
        DeviceDataset(tile_dir, crop_size=32, batch_size=6, mesh=mesh)


def test_uint8_loader_matches_float_loader(tile_dir):
    """Same seed -> the uint8 pipeline yields exactly the float pipeline's
    crops, just quantized; ingest_batch recovers identical floats."""
    f32 = TrainDataset(tile_dir, crop_size=32, seed=3)
    u8 = TrainDataset(tile_dir, crop_size=32, seed=3, out_dtype="uint8")
    xf, _ = next(f32.batches(2, num_workers=1))
    xu, _ = next(u8.batches(2, num_workers=1))
    assert xu.dtype == np.uint8
    cfg = mse_lpips_config(**TINY)
    xi = np.asarray(ingest_batch(jnp.asarray(xu), cfg))
    np.testing.assert_allclose(xi, xf, atol=1e-7)


@pytest.mark.slow
def test_train_step_accepts_uint8(tile_dir):
    """One G step on a uint8 batch == the same step on the equivalent
    float batch (identical state in, matching diagnostics out). Slow:
    compiles a full train step twice (~80 s on the CI box)."""
    cfg = mse_lpips_config(crop_size=64, batch_size=2, **TINY)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step_g = jax.jit(make_train_step_g(cfg))

    rng = np.random.RandomState(1)
    xu = (rng.rand(2, 64, 64, 3) * 255).astype(np.uint8)
    xf = xu.astype(np.float32) / 255.0

    _, diag_u = step_g(state, jnp.asarray(xu))
    _, diag_f = step_g(state, jnp.asarray(xf))
    np.testing.assert_allclose(
        float(diag_u["weighted_compression_loss"]),
        float(diag_f["weighted_compression_loss"]), rtol=1e-6)
