"""Diffusion model facade: denoiser + process + normalizers.

Rebuild of the reference DiffusionModel
(npcd/models/diffusion/diffusion_model.py:91-133) as a functional facade:
parameters and normalizer statistics live in an explicit DiffusionState
pytree; loss and generation are pure functions of (state, rng, data).
Generation jits the whole scan-based sampler once and reuses it across
batches.
"""
from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ...utils import logging
from ...utils.util import split_num
from .gaussian_diffusion import GaussianDiffusion
from .normalizers import (
    NormalizerStats,
    denormalize,
    fit_minus_one_to_one,
    fit_unit_gaussian,
    normalize,
)
from .transformer import NPCDTransformer


@flax.struct.dataclass
class DiffusionState:
    params: dict
    coords_norm: NormalizerStats
    feats_norm: NormalizerStats


class DiffusionModel:
    def __init__(
        self,
        coords_dim: int = 3,
        feats_dim: int = 32,
        num_points: int = 512,
        width: int = 1024,
        layers: int = 24,
        heads: int = 16,
        dtype: jnp.dtype = jnp.float32,
        attn_impl: str = "auto",
        qkv_groups: Optional[int] = None,
        gelu: str = "auto",
        remat: bool = False,
        remat_policy: str = "full",
    ):
        self.coords_dim = coords_dim
        self.feats_dim = feats_dim
        self.num_points = num_points
        self.denoiser = NPCDTransformer(
            coords_dim=coords_dim,
            feats_dim=feats_dim,
            width=width,
            layers=layers,
            heads=heads,
            dtype=dtype,
            attn_impl=attn_impl,
            qkv_groups=qkv_groups,
            gelu=gelu,
            remat=remat,
            remat_policy=remat_policy,
        )
        self.process = GaussianDiffusion()

    # -- state --------------------------------------------------------------

    def init(self, rng: jax.Array) -> DiffusionState:
        coords = jnp.zeros((1, self.coords_dim, self.num_points), jnp.float32)
        feats = jnp.zeros((1, self.feats_dim, self.num_points), jnp.float32)
        t = jnp.zeros((1,), jnp.int32)
        params = self.denoiser.init(rng, coords, feats, t)["params"]
        return DiffusionState(
            params=params,
            coords_norm=NormalizerStats.identity(self.coords_dim),
            feats_norm=NormalizerStats.identity(self.feats_dim),
        )

    def fit_normalizers(self, state: DiffusionState, all_coords, all_feats) -> DiffusionState:
        """all_coords: [dim, num_data], all_feats: [dim, num_data]
        (cf. reference diffusion_training.py:44-45)."""
        return state.replace(
            coords_norm=fit_unit_gaussian(all_coords),
            feats_norm=fit_minus_one_to_one(all_feats),
        )

    # -- loss / generation ---------------------------------------------------

    def denoise_fn(self, params):
        def fn(coords_t, feats_t, t):
            return self.denoiser.apply({"params": params}, coords_t, feats_t, t)
        return fn

    def compute_loss(
        self,
        state: DiffusionState,
        rng: jax.Array,
        coords,
        feats,
        example_offset=0,
        denoiser=None,
    ):
        """coords: [N, coords_dim, P], feats: [N, feats_dim, P] (latent space).

        Timesteps and noise are drawn from per-example keys
        fold_in(rng, example_offset + i), so the loss is invariant to batch
        sharding: a shard_map step passes its shard's global offset
        (axis_index * shard_size) and reproduces exactly the draws the
        single-device / GSPMD step makes for the same examples.

        `denoiser` overrides the module applied to state.params — the
        shard_map tensor-parallel step passes a tp>1 clone whose params are
        the local shards (parallel/tp_step.py)."""
        coords = normalize(state.coords_norm, coords)
        feats = normalize(state.feats_norm, feats)
        n = coords.shape[0]
        keys = jax.vmap(lambda i: jax.random.fold_in(rng, i))(
            example_offset + jnp.arange(n)
        )
        t = jax.vmap(
            lambda k: jax.random.randint(k, (), 0, self.process.num_timesteps)
        )(jax.vmap(lambda k: jax.random.fold_in(k, 0))(keys))
        coords_noise = jax.vmap(
            lambda k: jax.random.normal(
                jax.random.fold_in(k, 1), coords.shape[1:], coords.dtype
            )
        )(keys)
        feats_noise = jax.vmap(
            lambda k: jax.random.normal(
                jax.random.fold_in(k, 2), feats.shape[1:], feats.dtype
            )
        )(keys)
        if denoiser is None:
            fn = self.denoise_fn(state.params)
        else:
            fn = lambda c, f, tt: denoiser.apply({"params": state.params}, c, f, tt)
        return self.process.p_losses(
            rng, fn, coords, feats, t,
            noise=(coords_noise, feats_noise),
        )

    @functools.partial(jax.jit, static_argnums=(0, 3, 4, 5, 6))
    def _generate_batch(
        self,
        state: DiffusionState,
        rng: jax.Array,
        batch_size: int,
        return_trajectory: bool = False,
        trajectory_stride: int = 1,
        data_sharding=None,
    ):
        rng_c, rng_f, rng_loop = jax.random.split(rng, 3)
        coords_start = jax.random.normal(
            rng_c, (batch_size, self.coords_dim, self.num_points), jnp.float32
        )
        feats_start = jax.random.normal(
            rng_f, (batch_size, self.feats_dim, self.num_points), jnp.float32
        )
        if data_sharding is not None:
            # constrain the initial noise to the data axis; GSPMD then
            # shards the whole scan-based sampler over the batch (params
            # replicated by the caller). Static argument: NamedSharding is
            # hashable, and each (batch_size, sharding) pair compiles once.
            coords_start = jax.lax.with_sharding_constraint(
                coords_start, data_sharding)
            feats_start = jax.lax.with_sharding_constraint(
                feats_start, data_sharding)
        out = self.process.p_sample_loop(
            rng_loop,
            self.denoise_fn(state.params),
            coords_start,
            feats_start,
            coords_clip_range=(state.coords_norm.min[0], state.coords_norm.max[0]),
            feats_clip_range=(state.feats_norm.min[0], state.feats_norm.max[0]),
            return_trajectory=return_trajectory,
            trajectory_stride=trajectory_stride,
        )
        coords, feats = out[0], out[1]
        coords = denormalize(state.coords_norm, coords)
        feats = denormalize(state.feats_norm, feats)
        if return_trajectory:
            return coords, feats, out[2]
        return coords, feats

    def generate(
        self,
        state: DiffusionState,
        rng: jax.Array,
        num: int,
        batch_size: int = 8,
        progress: bool = False,
        return_trajectory: bool = False,
        trajectory_stride: int = 1,
        data_sharding=None,
    ):
        """Generate `num` neural point clouds.

        Returns (coords [num, coords_dim, P], feats [num, feats_dim, P]) as
        stacked arrays (the reference returns python lists of per-object
        tensors; a dense batch is both equivalent and TPU-friendlier).

        With ``return_trajectory=True`` a third element is returned: a
        gaussian_diffusion.Trajectory whose fields are stacked over the
        batch axis (axis 1). Trajectory states are in NORMALIZED latent
        space — the reference collects them pre-denormalization too
        (diffusion_model.py:119-127 denormalizes only the final state).
        ``trajectory_stride`` keeps every stride-th step to bound memory.

        ``data_sharding`` (a NamedSharding over a data axis) runs each
        generate batch data-parallel: the initial noise is placed sharded
        and GSPMD partitions the scan sampler over the batch. Pass state
        replicated over the same mesh. Indivisible tail batches fall back
        to unsharded execution.
        """
        coords_out, feats_out, traj_out = [], [], []
        for i, bs in enumerate(split_num(num, batch_size)):
            rng, rng_batch = jax.random.split(rng)
            shard = data_sharding
            if shard is not None and bs % len(shard.mesh.devices.flat):
                shard = None  # indivisible tail batch: run unsharded
            out = self._generate_batch(
                state, rng_batch, bs, return_trajectory, trajectory_stride,
                data_sharding=shard,
            )
            coords_out.append(np.asarray(out[0]))
            feats_out.append(np.asarray(out[1]))
            if return_trajectory:
                traj_out.append(jax.tree_util.tree_map(np.asarray, out[2]))
            if progress:
                logging.info(f"generated {sum(c.shape[0] for c in coords_out)}/{num}")
        coords = np.concatenate(coords_out, 0)
        feats = np.concatenate(feats_out, 0)
        if return_trajectory:
            traj = jax.tree_util.tree_map(
                lambda *xs: np.concatenate(xs, 1), *traj_out
            )
            return coords, feats, traj
        return coords, feats
