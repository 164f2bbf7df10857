import jax.numpy as jnp
import numpy as np

from hific_tpu.config import Config, Schedule
from hific_tpu.training.losses import weighted_rate_loss
from hific_tpu.training.schedules import scheduled_param


def test_scheduled_param_multiplicative():
    """param * vals[i], i = #boundaries passed (reference utils.py:64-72)."""
    sched = Schedule(vals=(2.0, 1.0), steps=(50_000,))
    assert float(scheduled_param(4.0, sched, 0)) == 8.0
    assert float(scheduled_param(4.0, sched, 49_999)) == 8.0
    assert float(scheduled_param(4.0, sched, 50_000)) == 4.0
    assert float(scheduled_param(4.0, sched, 10 ** 7)) == 4.0


def test_scheduled_param_multi_boundary_and_ignore():
    sched = Schedule(vals=(1.0, 0.5, 0.1), steps=(10, 20))
    got = [float(scheduled_param(1.0, sched, s)) for s in (5, 15, 25)]
    np.testing.assert_allclose(got, [1.0, 0.5, 0.1], rtol=1e-6)
    assert float(scheduled_param(3.0, sched, 15, ignore_schedule=True)) == 3.0


def test_weighted_rate_loss_two_tier():
    cfg = Config(regime="low", ignore_schedule=True)
    nbpp = jnp.asarray(0.5)
    # above target -> lambda_A; below -> lambda_B
    over, pen_a = weighted_rate_loss(cfg, nbpp, jnp.asarray(0.5), 0, True)
    under, pen_b = weighted_rate_loss(cfg, nbpp, jnp.asarray(0.05), 0, True)
    assert float(pen_a) == cfg.lambda_A and float(pen_b) == cfg.lambda_B
    np.testing.assert_allclose(float(over), cfg.lambda_A * 0.5)
    np.testing.assert_allclose(float(under), cfg.lambda_B * 0.5)


def test_regime_resolution():
    assert Config(regime="low").target_rate == 0.14
    assert Config(regime="med").target_rate == 0.3
    assert Config(regime="high").lambda_A == 0.5
    # explicit override wins
    assert Config(regime="low", target_rate=0.2).target_rate == 0.2


def test_config_json_roundtrip():
    cfg = Config(regime="med", batch_size=16,
                 lambda_schedule=Schedule((2.0, 1.0), (1000,)))
    cfg2 = Config.from_json(cfg.to_json())
    assert cfg2 == cfg
