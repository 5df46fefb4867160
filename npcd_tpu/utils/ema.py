"""EMA of model parameters as a pure pytree lerp.

Rebuild of the reference EMAHandler/EmaScheduler (npcd/utils/ema.py): an
inverse-decay warmup schedule ``1 - (1 + n/inv_gamma)^-power`` clamped to
[min_value, max_value], applied per step as ``ema = ema*d + params*(1-d)``.
Unlike the reference (a deepcopied module with in-place lerp_ per tensor),
the EMA here is just another parameter pytree updated inside the jitted
train step — no extra device round trips.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class EmaConfig:
    power: float = 1.0
    min_value: float = 0.0
    max_value: float = 1.0
    ema_on_buffers: bool = False  # kept for checkpoint-name parity
    inv_gamma: float = 1.0
    start_at: int = 0

    @classmethod
    def from_tuple(cls, t: Sequence) -> "EmaConfig":
        power, min_value, max_value, buffers = t
        return cls(
            power=float(power),
            min_value=float(min_value),
            max_value=float(max_value),
            ema_on_buffers=bool(buffers),
        )

    def param_string(self) -> str:
        """Checkpoint-name encoding (reference ema.py:52-56):
        power1_0min0_9999max0_9999buffers0."""
        s = (
            f"power{float(self.power)}min{float(self.min_value)}"
            f"max{float(self.max_value)}buffers{int(self.ema_on_buffers)}"
        )
        return s.replace(".", "_")


def ema_decay(cfg: EmaConfig, step: jnp.ndarray) -> jnp.ndarray:
    """Decay value at (0-indexed) update count `step` (traced)."""
    epoch = jnp.maximum(0, step - cfg.start_at).astype(jnp.float32)
    value = 1.0 - (1.0 + epoch / cfg.inv_gamma) ** (-cfg.power)
    return jnp.clip(value, cfg.min_value, cfg.max_value)


def ema_update(cfg: EmaConfig, step: jnp.ndarray, ema_params: Any, params: Any) -> Any:
    d = ema_decay(cfg, step)
    return jax.tree_util.tree_map(
        lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d), ema_params, params
    )
