"""DDPM noise-schedule buffers.

Semantics match the reference precompute
(npcd/models/diffusion/diffusion_processes/gaussian_diffusion.py:7-52):
a linear beta schedule over T=1000 steps, all derived buffers computed in
float64 for accuracy and stored in float32. The buffers form a single
immutable pytree so they can be closed over by jitted train steps and the
lax.scan sampler without retracing.
"""
from __future__ import annotations

import flax.struct
import jax.numpy as jnp
import numpy as np


def get_beta_schedule(
    schedule_type: str,
    *,
    num_diffusion_steps: int,
    beta_start: float | None = None,
    beta_end: float | None = None,
) -> np.ndarray:
    if schedule_type == "linear":
        scale = 1000.0 / num_diffusion_steps
        beta_start = scale * 0.0001 if beta_start is None else beta_start
        beta_end = scale * 0.02 if beta_end is None else beta_end
        return np.linspace(beta_start, beta_end, num_diffusion_steps, dtype=np.float64)
    raise NotImplementedError(schedule_type)


@flax.struct.dataclass
class DiffusionSchedule:
    """All DDPM buffers, each of shape [T]."""

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_one_minus_betas: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray

    @property
    def num_timesteps(self) -> int:
        return int(self.betas.shape[0])


def make_schedule(
    schedule_type: str = "linear",
    num_diffusion_steps: int = 1000,
    beta_start: float | None = None,
    beta_end: float | None = None,
) -> DiffusionSchedule:
    betas = get_beta_schedule(
        schedule_type,
        num_diffusion_steps=num_diffusion_steps,
        beta_start=beta_start,
        beta_end=beta_end,
    )
    assert (betas > 0).all() and (betas <= 1).all()

    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])

    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    # Clipped because posterior variance is 0 at t=0 (log would be -inf).
    posterior_log_variance_clipped = np.log(
        np.concatenate([posterior_variance[1:2], posterior_variance[1:]])
    )

    f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
    return DiffusionSchedule(
        betas=f32(betas),
        alphas_cumprod=f32(alphas_cumprod),
        alphas_cumprod_prev=f32(alphas_cumprod_prev),
        sqrt_one_minus_betas=f32(np.sqrt(1.0 - betas)),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        log_one_minus_alphas_cumprod=f32(np.log(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1.0)),
        posterior_variance=f32(posterior_variance),
        posterior_log_variance_clipped=f32(posterior_log_variance_clipped),
        posterior_mean_coef1=f32(
            betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        ),
        posterior_mean_coef2=f32(
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
        ),
    )


def extract(buf: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-timestep coefficients and reshape for broadcasting against a
    [N, ...] data tensor with `ndim` dims (reference gaussian_diffusion.py:55-60)."""
    out = buf[t]
    return out.reshape(out.shape[0], *([1] * (ndim - 1)))
