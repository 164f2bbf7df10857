"""End-to-end slice tests: jitted train steps on a tiny model.

The JAX analog of the reference's `python3 -m src.model` smoke test
(model.py:389-463 / BASELINE.json config #1), plus data-parallel execution
over the virtual 8-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from hific_tpu.config import Config, hific_config, mse_lpips_config
from hific_tpu.training.train_step import (
    create_train_state,
    make_eval_step,
    make_train_step_d,
    make_train_step_g,
)

TINY = dict(
    latent_channels=8,
    n_residual_blocks=1,
    hyperlatent_filters=16,
    crop_size=64,
    batch_size=2,
)


def _batch(b=2, hw=64, seed=0):
    return jnp.asarray(
        np.random.RandomState(seed).rand(b, hw, hw, 3).astype(np.float32))


def test_compression_train_step_decreases_loss():
    cfg = mse_lpips_config(**TINY)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step_g = jax.jit(make_train_step_g(cfg))
    x = _batch()
    losses = []
    for _ in range(5):
        state, diag = step_g(state, x)
        losses.append(float(diag["weighted_compression_loss"]))
    assert int(state.step) == 5
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # optimizing on a fixed batch


def test_gan_train_steps():
    cfg = hific_config(**TINY)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step_g = jax.jit(make_train_step_g(cfg))
    step_d = jax.jit(make_train_step_d(cfg))
    xg, xd = _batch(seed=0), _batch(seed=1)

    state, diag_g = step_g(state, xg)
    assert "gen_loss" in diag_g
    disc_before = jax.tree_util.tree_leaves(state.disc_params)[0]
    state, diag_d = step_d(state, xd)
    disc_after = jax.tree_util.tree_leaves(state.disc_params)[0]
    assert np.isfinite(float(diag_d["disc_loss"]))
    assert not np.allclose(disc_before, disc_after)  # D actually updated
    assert int(state.step) == 1  # only G steps increment


def test_g_step_does_not_touch_disc_params():
    cfg = hific_config(**TINY)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step_g = jax.jit(make_train_step_g(cfg))
    before = jax.tree_util.tree_map(np.asarray, state.disc_params)
    state, _ = step_g(state, _batch())
    after = jax.tree_util.tree_map(np.asarray, state.disc_params)
    for a, b in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(a, b)


def test_optimizer_partition_labels():
    from hific_tpu.training.train_step import _param_labels

    cfg = mse_lpips_config(**TINY)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    labels = _param_labels(state.params)
    import flax

    flat = flax.traverse_util.flatten_dict(labels)
    hyper_keys = [k for k, v in flat.items() if v == "hyper"]
    amort_keys = [k for k, v in flat.items() if v == "amort"]
    assert all("hyperlatent_density" in k for k in hyper_keys)
    assert len(hyper_keys) > 0 and len(amort_keys) > 0
    assert not any("hyperlatent_density" in k for k in amort_keys)


def test_eval_step():
    cfg = mse_lpips_config(**TINY)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    eval_fn = jax.jit(make_eval_step(cfg))
    diag, inter = eval_fn(state, _batch(), jax.random.PRNGKey(5))
    assert np.isfinite(float(diag["weighted_compression_loss"]))
    assert inter.reconstruction.shape == (2, 64, 64, 3)


def test_data_parallel_step_matches_single_device():
    from hific_tpu.parallel import make_mesh, shard_train_step, shard_batch
    from hific_tpu.parallel.mesh import replicate

    assert len(jax.devices()) == 8, "conftest should give 8 virtual devices"
    cfg = mse_lpips_config(**{**TINY, "batch_size": 8})
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    x = _batch(b=8)

    # single device reference
    step_single = jax.jit(make_train_step_g(cfg))
    state_s, diag_s = step_single(state, x)

    # data parallel over 8 virtual devices
    mesh = make_mesh()
    step_dp = shard_train_step(make_train_step_g(cfg), mesh, donate_state=False)
    state_r = replicate(state, mesh)
    x_sharded = shard_batch(x, mesh)
    state_p, diag_p = step_dp(state_r, x_sharded)

    np.testing.assert_allclose(
        float(diag_s["weighted_compression_loss"]),
        float(diag_p["weighted_compression_loss"]),
        rtol=1e-4,
    )
    # parameters agree after one step (tolerance: cross-device reduction
    # order differs, and Adam's rsqrt amplifies tiny gradient deltas)
    for a, b in zip(jax.tree_util.tree_leaves(state_s.params),
                    jax.tree_util.tree_leaves(state_p.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_2d_mesh_step_matches_single_device():
    """(replica=2, data=4) mesh — the multi-slice DCNxICI layout — must
    compute the same step as a single device (batch sharded over both
    axes, params replicated, all-reduce decomposed by XLA)."""
    from hific_tpu.parallel import make_mesh_2d, shard_train_step, shard_batch
    from hific_tpu.parallel.mesh import REPLICA_AXIS, DATA_AXIS, replicate

    assert len(jax.devices()) == 8
    cfg = mse_lpips_config(**{**TINY, "batch_size": 8})
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    x = _batch(b=8)

    step_single = jax.jit(make_train_step_g(cfg))
    state_s, diag_s = step_single(state, x)

    mesh = make_mesh_2d(n_slices=2)
    assert mesh.axis_names == (REPLICA_AXIS, DATA_AXIS)
    assert mesh.devices.shape == (2, 4)
    step_dp = shard_train_step(make_train_step_g(cfg), mesh,
                               donate_state=False)
    state_p, diag_p = step_dp(replicate(state, mesh), shard_batch(x, mesh))

    np.testing.assert_allclose(
        float(diag_s["weighted_compression_loss"]),
        float(diag_p["weighted_compression_loss"]), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(state_s.params),
                    jax.tree_util.tree_leaves(state_p.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)
