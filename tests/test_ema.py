"""EMA schedule/update tests (reference npcd/utils/ema.py)."""
import jax.numpy as jnp
import numpy as np
import pytest

from npcd_tpu.utils.ema import EmaConfig, ema_decay, ema_update


def test_decay_schedule_values():
    cfg = EmaConfig(power=1.0, min_value=0.0, max_value=1.0)
    # 1 - (1 + n)^-1 = n / (n+1)
    for n in [0, 1, 9, 99]:
        assert float(ema_decay(cfg, jnp.asarray(n))) == pytest.approx(n / (n + 1))


def test_decay_clamping():
    cfg = EmaConfig(power=1.0, min_value=0.9999, max_value=0.9999)
    assert float(ema_decay(cfg, jnp.asarray(0))) == pytest.approx(0.9999)
    assert float(ema_decay(cfg, jnp.asarray(10 ** 8))) == pytest.approx(0.9999)


def test_reference_schedule_landmarks():
    """Reference docstring: power=0.6667 reaches ~0.999 at 31.6k steps."""
    cfg = EmaConfig(power=0.6667)
    assert float(ema_decay(cfg, jnp.asarray(31600))) == pytest.approx(0.999, abs=2e-4)


def test_ema_update_lerp():
    cfg = EmaConfig(power=1.0, min_value=0.5, max_value=0.5)
    ema = {"w": jnp.asarray([1.0, 2.0])}
    params = {"w": jnp.asarray([3.0, 4.0])}
    out = ema_update(cfg, jnp.asarray(100), ema, params)
    np.testing.assert_allclose(np.asarray(out["w"]), [2.0, 3.0])


def test_param_string_roundtrip():
    cfg = EmaConfig.from_tuple((1, 0.9999, 0.9999, False))
    assert cfg.param_string() == "power1_0min0_9999max0_9999buffers0"
