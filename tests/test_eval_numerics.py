"""Eval-time numerics qualification: bf16/tanh-GELU generation vs f32/erf.

Training-time bf16 + tanh-GELU deviations are qualified in docs/PARITY.md;
generation compounds differently: the 1000-step ancestral sampler feeds each
step's denoiser output back through the chain (reference
gaussian_diffusion.py:148-177), so per-step rounding could in principle
accumulate. This test runs the FULL T=1000 sampler twice on identical noise
draws — once reference-exact (f32 storage+compute, erf GELU), once the fast
TPU path (bf16 compute, tanh GELU) — and bounds the divergence both in
latent space and after rendering through the PointNeRF decoder (the FID
protocol's input).

Measured on this geometry (width 64, 4 layers, perturbed output head):
latent mean|Δ| ≈ 4e-4 of the latent std, render cross-PSNR ≈ 72 dB — orders
of magnitude below metric visibility. The eval CLIs still default to
f32/erf (reference-exact); this qualifies the bf16 sampler as a safe speed
option. The x0-clip to the normalizer range every step (reference
gaussian_diffusion.py:100-125) is what keeps the chain contractive rather
than compounding.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from npcd_tpu.models.diffusion import DiffusionModel
from npcd_tpu.models.pointnerf import PointNeRF, PointNeRFRenderConfig
from npcd_tpu.data.synthetic import random_cameras
from npcd_tpu.utils.config import pointnerf_default_options

P, FD, RES = 32, 8, 32
W, L, H = 64, 4, 2
N = 4


def _build_dm(dtype, gelu):
    return DiffusionModel(
        coords_dim=3, feats_dim=FD, num_points=P, width=W, layers=L,
        heads=H, dtype=dtype, gelu=gelu, attn_impl="einsum",
    )


def _randomize_output_proj(state):
    """output_proj is zero-init (reference parity, transformer.py:242-244),
    which would make an untrained sampler's epsilon exactly 0 in every dtype
    and the comparison vacuous. Give it small random weights so the chain
    exercises the full network."""
    p = dict(state.params)
    leaves, treedef = jax.tree_util.tree_flatten(p["output_proj"])
    keys = jax.random.split(jax.random.PRNGKey(99), len(leaves))
    p["output_proj"] = treedef.unflatten(
        [jax.random.normal(k, l.shape, l.dtype) * 0.02
         for k, l in zip(keys, leaves)]
    )
    return state.replace(params=p)


def test_bf16_tanh_generation_matches_f32_erf_downstream():
    dm32 = _build_dm(jnp.float32, "erf")
    dm16 = _build_dm(jnp.bfloat16, "tanh")

    state = dm32.init(jax.random.PRNGKey(0))
    g = np.random.default_rng(1)
    all_c = g.normal(size=(3, P * 64)).astype(np.float32) * 0.4
    all_f = g.normal(size=(FD, P * 64)).astype(np.float32) * 2.0
    state = _randomize_output_proj(dm32.fit_normalizers(state, all_c, all_f))

    # identical start noise + per-step noise (both samplers keep x_t in f32;
    # only the denoiser compute dtype / GELU flavor differ)
    c32, f32_ = dm32.generate(state, jax.random.PRNGKey(7), num=N, batch_size=N)
    c16, f16_ = dm16.generate(state, jax.random.PRNGKey(7), num=N, batch_size=N)

    # the comparison must be non-vacuous: bf16 must actually perturb the chain
    assert float(np.abs(c32 - c16).max()) > 0

    c_rel = float(np.abs(c32 - c16).mean() / c32.std())
    f_rel = float(np.abs(f32_ - f16_).mean() / f32_.std())
    assert c_rel < 5e-3, c_rel   # measured ~3e-4
    assert f_rel < 5e-3, f_rel   # measured ~4e-4

    # downstream render (the FID protocol input): images must be
    # indistinguishable at metric precision
    opts = pointnerf_default_options(num_points=P, feat_dim=FD)
    opts = dataclasses.replace(
        opts,
        renderer=dataclasses.replace(
            opts.renderer, depth_resolution=16, ray_subsamples=24),
        aggregator=dataclasses.replace(opts.aggregator, max_shading_pts=6),
        default_resolution=RES,
    )
    pn = PointNeRF(
        n_obj=N, feats_dim=FD, num_points=P, opts=opts,
        render_config=PointNeRFRenderConfig(train_rays=8, eval_ray_chunk=256),
    )
    pn_params = pn.init_params(jax.random.PRNGKey(3))
    extr, intr = random_cameras(1, RES, seed=5)
    extr = np.repeat(extr[None], N, 0)
    intr = np.repeat(intr[None], N, 0)

    def render(c, f):
        out = pn.render(
            pn_params,
            jnp.asarray(np.transpose(c, (0, 2, 1))),
            jnp.asarray(np.transpose(f, (0, 2, 1))),
            jnp.asarray(extr), jnp.asarray(intr), resolution=RES,
        )
        return np.asarray(out["channels"])

    i32, i16 = render(c32, f32_), render(c16, f16_)
    mse = float(np.mean((i32 - i16) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 45.0, psnr  # measured ~72 dB; FID needs ≳30 dB agreement
