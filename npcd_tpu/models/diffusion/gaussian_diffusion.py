"""Gaussian diffusion (DDPM) over joint (coords, feats) point-cloud latents.

Functional rebuild of the reference process
(npcd/models/diffusion/diffusion_processes/gaussian_diffusion.py). All
methods are pure and traceable; the 1000-step ancestral sampler is a single
jax.lax.scan over the schedule instead of the reference's Python loop
(gaussian_diffusion.py:148-177), so generation compiles to one XLA program.

Noise handling: every stochastic op takes an explicit PRNG key.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...utils.util import discretized_gaussian_log_likelihood, mean_flat, normal_kl
from .schedule import DiffusionSchedule, extract, make_schedule

# denoise_fn(coords_t, feats_t, t) -> (eps_coords, eps_feats)
DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]]


class PSampleOut(NamedTuple):
    coords: jnp.ndarray
    feats: jnp.ndarray
    coords_recon: jnp.ndarray
    feats_recon: jnp.ndarray


class Trajectory(NamedTuple):
    """Stacked reverse-process trajectory (reference
    gaussian_diffusion.py:148-177 returns the same data as python lists).

    coords_ts/feats_ts have a leading axis of K+1 (the start state x_T
    followed by the K collected states, ending at x_0); the recon fields
    have K entries (the x0-prediction at each collected step). K =
    num_timesteps // trajectory_stride."""

    coords_ts: jnp.ndarray
    coords_recons: jnp.ndarray
    feats_ts: jnp.ndarray
    feats_recons: jnp.ndarray


class GaussianDiffusion:
    def __init__(self, schedule: Optional[DiffusionSchedule] = None):
        self.schedule = schedule if schedule is not None else make_schedule()

    @property
    def num_timesteps(self) -> int:
        return self.schedule.num_timesteps

    # -- forward process ----------------------------------------------------

    def q_mean_variance(self, x_start, t):
        s = self.schedule
        mean = extract(s.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
        variance = extract(1.0 - s.alphas_cumprod, t, x_start.ndim)
        log_variance = extract(s.log_one_minus_alphas_cumprod, t, x_start.ndim)
        return mean, variance, log_variance

    def q_sample(self, x_start, t, noise):
        s = self.schedule
        return (
            extract(s.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
            + extract(s.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * noise
        )

    def q_sample_next(self, x_t, t, noise):
        """One forward-process step x_t -> x_{t+1} (reference
        gaussian_diffusion.py:78-89). Unused by the reference pipelines;
        kept for API completeness. Matches the reference exactly, including
        its noise scale of beta_t (not sqrt(beta_t))."""
        s = self.schedule
        return (
            extract(s.sqrt_one_minus_betas, t, x_t.ndim) * x_t
            + extract(s.betas, t, x_t.ndim) * noise
        )

    def q_posterior_mean_variance(self, x_start, x_t, t):
        s = self.schedule
        mean = (
            extract(s.posterior_mean_coef1, t, x_t.ndim) * x_start
            + extract(s.posterior_mean_coef2, t, x_t.ndim) * x_t
        )
        variance = extract(s.posterior_variance, t, x_t.ndim)
        log_variance_clipped = extract(s.posterior_log_variance_clipped, t, x_t.ndim)
        return mean, variance, log_variance_clipped

    # -- reverse process ----------------------------------------------------

    def predict_xstart_from_eps(self, x_t, t, eps):
        s = self.schedule
        return (
            extract(s.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
            - extract(s.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * eps
        )

    def predict_eps_from_xstart(self, x_t, t, x_start):
        s = self.schedule
        return (
            extract(s.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t - x_start
        ) / extract(s.sqrt_recipm1_alphas_cumprod, t, x_t.ndim)

    def _mean_recon(self, x_t, t, eps, clip_range):
        recon = self.predict_xstart_from_eps(x_t, t, eps)
        if clip_range is not None:
            recon = jnp.clip(recon, clip_range[0], clip_range[1])
        mean, _, log_variance = self.q_posterior_mean_variance(recon, x_t, t)
        return mean, log_variance, recon

    def p_mean_variance(
        self,
        denoise_fn: DenoiseFn,
        coords_t,
        feats_t,
        t,
        coords_clip_range=None,
        feats_clip_range=None,
    ):
        eps_coords, eps_feats = denoise_fn(coords_t, feats_t, t)
        c_mean, c_logvar, c_recon = self._mean_recon(coords_t, t, eps_coords, coords_clip_range)
        f_mean, f_logvar, f_recon = self._mean_recon(feats_t, t, eps_feats, feats_clip_range)
        return c_mean, c_logvar, c_recon, f_mean, f_logvar, f_recon

    def p_sample(
        self,
        rng: jax.Array,
        denoise_fn: DenoiseFn,
        coords_t,
        feats_t,
        t,
        coords_clip_range=None,
        feats_clip_range=None,
    ) -> PSampleOut:
        """One ancestral sampling step x_t -> x_{t-1}; no noise at t == 0."""
        c_mean, c_logvar, c_recon, f_mean, f_logvar, f_recon = self.p_mean_variance(
            denoise_fn, coords_t, feats_t, t, coords_clip_range, feats_clip_range
        )
        rng_c, rng_f = jax.random.split(rng)
        nonzero = (t != 0).astype(coords_t.dtype).reshape(-1, *([1] * (coords_t.ndim - 1)))
        coords_next = c_mean + nonzero * jnp.exp(0.5 * c_logvar) * jax.random.normal(
            rng_c, coords_t.shape, coords_t.dtype
        )
        feats_next = f_mean + nonzero * jnp.exp(0.5 * f_logvar) * jax.random.normal(
            rng_f, feats_t.shape, feats_t.dtype
        )
        return PSampleOut(coords_next, feats_next, c_recon, f_recon)

    def p_sample_loop(
        self,
        rng: jax.Array,
        denoise_fn: DenoiseFn,
        coords_start,
        feats_start,
        coords_clip_range=None,
        feats_clip_range=None,
        return_trajectory: bool = False,
        trajectory_stride: int = 1,
    ):
        """Full reverse process as one lax.scan.

        Default: returns only the final (coords, feats) — the FID eval path
        consumes nothing else, so the 1000 intermediate states are never
        materialized. With ``return_trajectory=True`` it additionally returns
        a :class:`Trajectory` of stacked intermediate states and x0-recons
        (the reference capability, gaussian_diffusion.py:148-177, used for
        trajectory visualization/diagnostics). ``trajectory_stride`` keeps
        only every stride-th step (must divide num_timesteps) to bound
        memory; stride 1 collects every step like the reference. The rng
        consumption is identical in both modes, so the final sample is
        bit-equal regardless of the flags.
        """
        n = coords_start.shape[0]

        def step(carry, t_scalar):
            coords_t, feats_t, rng = carry
            rng, rng_step = jax.random.split(rng)
            t = jnp.full((n,), t_scalar, dtype=jnp.int32)
            out = self.p_sample(
                rng_step, denoise_fn, coords_t, feats_t, t,
                coords_clip_range, feats_clip_range,
            )
            return (out.coords, out.feats, rng), out

        ts = jnp.arange(self.num_timesteps - 1, -1, -1, dtype=jnp.int32)
        init = (coords_start, feats_start, rng)

        if not return_trajectory:
            (coords, feats, _), _ = jax.lax.scan(
                lambda c, t: (step(c, t)[0], None), init, ts
            )
            return coords, feats

        stride = trajectory_stride
        if self.num_timesteps % stride:
            raise ValueError(
                f"trajectory_stride {stride} must divide num_timesteps "
                f"{self.num_timesteps}"
            )

        def group(carry, t_group):
            # inner scan advances `stride` steps; only the last step's
            # state/recon is emitted, bounding trajectory memory to
            # T/stride frames
            carry, outs = jax.lax.scan(step, carry, t_group)
            last = jax.tree_util.tree_map(lambda x: x[-1], outs)
            return carry, last

        (coords, feats, _), collected = jax.lax.scan(
            group, init, ts.reshape(self.num_timesteps // stride, stride)
        )
        trajectory = Trajectory(
            coords_ts=jnp.concatenate([coords_start[None], collected.coords], 0),
            coords_recons=collected.coords_recon,
            feats_ts=jnp.concatenate([feats_start[None], collected.feats], 0),
            feats_recons=collected.feats_recon,
        )
        return coords, feats, trajectory

    # -- training loss ------------------------------------------------------

    def p_losses(
        self,
        rng: jax.Array,
        denoise_fn: DenoiseFn,
        coords_start,
        feats_start,
        t,
        noise: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    ):
        """Joint eps-MSE on coords and feats, each halved so their sum is the
        average (reference gaussian_diffusion.py:199-230).

        `noise` optionally supplies (coords_noise, feats_noise) explicitly —
        used by DiffusionModel.compute_loss to draw noise per example so the
        loss is invariant to how the batch is sharded over a device mesh."""
        if noise is not None:
            coords_noise, feats_noise = noise
        else:
            rng_c, rng_f = jax.random.split(rng)
            coords_noise = jax.random.normal(rng_c, coords_start.shape, coords_start.dtype)
            feats_noise = jax.random.normal(rng_f, feats_start.shape, feats_start.dtype)

        coords_t = self.q_sample(coords_start, t, coords_noise)
        feats_t = self.q_sample(feats_start, t, feats_noise)

        eps_coords, eps_feats = denoise_fn(coords_t, feats_t, t)
        pointwise_coords_loss = (coords_noise - eps_coords.astype(jnp.float32)) ** 2 / 2.0
        pointwise_feats_loss = (feats_noise - eps_feats.astype(jnp.float32)) ** 2 / 2.0
        coords_loss = pointwise_coords_loss.mean()
        feats_loss = pointwise_feats_loss.mean()
        loss = coords_loss + feats_loss

        sub_losses = {"00_coords_loss": coords_loss, "01_feats_loss": feats_loss}
        pointwise_losses = {
            "pointwise_coords_loss": pointwise_coords_loss,
            "pointwise_feats_loss": pointwise_feats_loss,
        }
        return loss, sub_losses, pointwise_losses

    # -- diagnostics (reference gaussian_diffusion.py:179-197,243-307) -------

    def _vb_terms_bpd(self, denoise_fn, coords_start, coords_t, feats_start, feats_t, t):
        c_mean, c_logvar, c_recon, f_mean, f_logvar, f_recon = self.p_mean_variance(
            denoise_fn, coords_t, feats_t, t
        )

        def vb(x_start, x_t, mean, logvar):
            true_mean, _, true_logvar = self.q_posterior_mean_variance(x_start, x_t, t)
            kl = normal_kl(true_mean, true_logvar, mean, logvar)
            kl = mean_flat(kl) / np.log(2.0)
            nll = -discretized_gaussian_log_likelihood(
                x_start, means=mean, log_scales=0.5 * logvar
            )
            nll = mean_flat(nll) / np.log(2.0)
            return jnp.where(t == 0, nll, kl)

        return (
            vb(coords_start, coords_t, c_mean, c_logvar),
            c_recon,
            vb(feats_start, feats_t, f_mean, f_logvar),
            f_recon,
        )

    def calc_bpd_loop(self, rng: jax.Array, denoise_fn: DenoiseFn,
                      coords_start, feats_start):
        """Full variational-bound diagnostics over all T timesteps as one
        lax.scan (reference gaussian_diffusion.py:243-307 runs a Python
        loop of 1000 denoiser forwards).

        Returns a dict with, for each of coords/feats: total_bpd [N],
        vb [N, T], prior_bpd [N], xstart_mse [N, T], mse [N, T]. Timestep
        axis is ordered t = T-1 .. 0, matching the reference."""
        n = coords_start.shape[0]

        def step(rng, t_scalar):
            rng, rng_c, rng_f = jax.random.split(rng, 3)
            t = jnp.full((n,), t_scalar, dtype=jnp.int32)
            noise_c = jax.random.normal(rng_c, coords_start.shape, coords_start.dtype)
            noise_f = jax.random.normal(rng_f, feats_start.shape, feats_start.dtype)
            coords_t = self.q_sample(coords_start, t, noise_c)
            feats_t = self.q_sample(feats_start, t, noise_f)
            vb_c, recon_c, vb_f, recon_f = self._vb_terms_bpd(
                denoise_fn, coords_start, coords_t, feats_start, feats_t, t
            )
            out = {
                "vb_coords": vb_c,
                "vb_feats": vb_f,
                "xstart_mse_coords": mean_flat((recon_c - coords_start) ** 2),
                "xstart_mse_feats": mean_flat((recon_f - feats_start) ** 2),
                "mse_coords": mean_flat(
                    (self.predict_eps_from_xstart(coords_t, t, recon_c) - noise_c) ** 2
                ),
                "mse_feats": mean_flat(
                    (self.predict_eps_from_xstart(feats_t, t, recon_f) - noise_f) ** 2
                ),
            }
            return rng, out

        ts = jnp.arange(self.num_timesteps - 1, -1, -1, dtype=jnp.int32)
        _, per_t = jax.lax.scan(step, rng, ts)  # each [T, N]
        per_t = {k: jnp.transpose(v) for k, v in per_t.items()}  # [N, T]

        prior_c = self.prior_bpd(coords_start)
        prior_f = self.prior_bpd(feats_start)
        return {
            "total_bpd_coords": per_t["vb_coords"].sum(axis=1) + prior_c,
            "vb_coords": per_t["vb_coords"],
            "prior_bpd_coords": prior_c,
            "xstart_mse_coords": per_t["xstart_mse_coords"],
            "mse_coords": per_t["mse_coords"],
            "total_bpd_feats": per_t["vb_feats"].sum(axis=1) + prior_f,
            "vb_feats": per_t["vb_feats"],
            "prior_bpd_feats": prior_f,
            "xstart_mse_feats": per_t["xstart_mse_feats"],
            "mse_feats": per_t["mse_feats"],
        }

    def prior_bpd(self, x_start):
        n = x_start.shape[0]
        t = jnp.full((n,), self.num_timesteps - 1, dtype=jnp.int32)
        qt_mean, _, qt_log_variance = self.q_mean_variance(x_start, t)
        kl_prior = normal_kl(qt_mean, qt_log_variance, 0.0, 0.0)
        return mean_flat(kl_prior) / np.log(2.0)
