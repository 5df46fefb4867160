"""Fused LayerNorm Pallas kernel (fwd + bwd) for the NPCD denoiser.

Motivation (measured on TPU v5e, see commit message): XLA lowers the f32
LayerNorm in each transformer block to a multi-pass convert/reduce fusion
costing ~1.7 ms per LN over [32, 513, 1024] — ~49 LNs x fwd+bwd dominated
the 302M-param train step. This kernel does the whole normalization in one
VMEM pass (bf16 IO, f32 statistics — same numerics as the reference's
LayerNorm-in-f32, npcd/models/diffusion/denoisers/transformer.py:xx LayerNorm
cast, since the consumer casts back to bf16 anyway).

Layout: x [N, S, W] with W a multiple of 128 (lane dim); grid over N; each
program normalizes one [S, W] slab. Saved residuals for the backward are the
bf16 input plus per-row mean/rstd (f32, [N, S]) — smaller than what XLA
autodiff would keep.

Row-block layout experiment (NPCD_LN_ROWS): LayerNorm is per-row, so the
grid does not have to follow the batch dim. Setting NPCD_LN_ROWS=R (a
multiple of 16 dividing N*S) re-blocks the flattened token stream
[N*S, W] into [N*S/R, R, W] slabs — the same kernels run over a different
grid/block-size trade-off (DMA pipelining granularity vs per-program
overhead). NPCD_LN_ROWS=auto picks the largest divisor <= 1024. Unset
keeps the per-batch slab layout except for very large inputs, where a
VMEM guard re-blocks the row dim (see _grid_layout). An explicit
NPCD_LN_ROWS=0 forces the pure slab layout and skips the guard (debug /
A-B escape hatch). Numerics are identical in every layout
(each row is normalized independently); `tools/tputime.py` is the intended
A/B harness.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# LayerNorm grid steps are independent rows; telling Mosaic lets it
# pipeline/reorder programs freely.
_PARALLEL_GRID = pltpu.CompilerParams(dimension_semantics=("parallel",))


def _grid_layout(n: int, s: int) -> tuple[int, int]:
    """(grid, rows-per-program) for the [N, S, W] inputs.

    Default: (n, s) — one program per batch slab. With NPCD_LN_ROWS set,
    re-block the flattened N*S rows into blocks of R rows (R must divide
    N*S and be a multiple of 16 so bf16 sublane tiles stay aligned);
    invalid settings fall back to the slab layout.
    """
    v = os.environ.get("NPCD_LN_ROWS", "").strip()
    if v == "0":
        # Explicit 0: force the pure per-batch slab layout, skipping the
        # large-input guard (debug / A-B escape hatch).
        return n, s
    if not v:
        # Large-input guard: above every measured training/eval config
        # (stage-2 train 32x520 = 16,640 rows) the per-batch slab layout
        # can exceed the 16 MB scoped-VMEM budget (measured:
        # generate_batch_size=128 fails to compile with an 18.28M scoped
        # allocation in the lnres fwd). LayerNorm is per-row, so use
        # smaller row blocks — numerics identical in every layout (see
        # module docstring + tests/test_layer_norm.py row-block test).
        if n * s >= 32768 and s > 128:
            # Split only the row dim s (never merge across the batch dim:
            # (n, s) -> (n*k, s/k) is a layout-preserving row split that
            # keeps batch rows contiguous, so batch sharding under GSPMD
            # stays representable). Largest divisor of s that is a
            # multiple of 16 (bf16 sublane-tile alignment, same constraint
            # as the env path) and <= 512 rows; no such divisor -> keep
            # the proven slab layout.
            r = 0
            for cand in range(16, min(s, 512) + 1, 16):
                if s % cand == 0:
                    r = cand
            if r == 0 or r == s:
                return n, s
            return n * (s // r), r
        return n, s
    ns = n * s
    if v == "auto":
        r = 0
        for cand in range(16, min(ns, 1024) + 1, 16):
            if ns % cand == 0:
                r = cand
        if r == 0:
            return n, s
    else:
        try:
            r = int(v)
        except ValueError:
            return n, s
    if r <= 0 or r % 16 != 0 or ns % r != 0:
        return n, s
    return ns // r, r


def _ln_fwd_kernel(x_ref, gamma_ref, beta_ref, y_ref, mean_ref, rstd_ref,
                   *, eps: float):
    x = x_ref[0].astype(jnp.float32)  # [S, W]
    w = x.shape[-1]
    mean = jnp.sum(x, axis=-1, keepdims=True) / w
    xc = x - mean
    var = jnp.sum(xc * xc, axis=-1, keepdims=True) / w
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    y = xhat * gamma_ref[0].astype(jnp.float32) + beta_ref[0].astype(jnp.float32)
    y_ref[0] = y.astype(y_ref.dtype)
    mean_ref[0] = mean  # [S, 1]
    rstd_ref[0] = rstd


def _ln_bwd_kernel(x_ref, gamma_ref, mean_ref, rstd_ref, g_ref,
                   dx_ref, dgamma_ref, dbeta_ref):
    x = x_ref[0].astype(jnp.float32)  # [S, W]
    g = g_ref[0].astype(jnp.float32)
    gamma = gamma_ref[0].astype(jnp.float32)  # [1, W]
    mean = mean_ref[0]  # [S, 1]
    rstd = rstd_ref[0]
    w = x.shape[-1]

    xhat = (x - mean) * rstd
    dxhat = g * gamma
    m1 = jnp.sum(dxhat, axis=-1, keepdims=True) / w
    m2 = jnp.sum(dxhat * xhat, axis=-1, keepdims=True) / w
    dx = rstd * (dxhat - m1 - xhat * m2)
    dx_ref[0] = dx.astype(dx_ref.dtype)
    # per-program partial parameter grads, summed over programs by the caller
    dgamma_ref[0] = jnp.sum(g * xhat, axis=0, keepdims=True)
    dbeta_ref[0] = jnp.sum(g, axis=0, keepdims=True)


def _ln_fwd_impl(x, gamma, beta, eps):
    n, s, w = x.shape
    gn, gs = _grid_layout(n, s)
    if (gn, gs) != (n, s):
        x = x.reshape(gn, gs, w)
    gamma2 = gamma.reshape(1, w)
    beta2 = beta.reshape(1, w)
    y, mean, rstd = pl.pallas_call(
        functools.partial(_ln_fwd_kernel, eps=eps),
        out_shape=(
            jax.ShapeDtypeStruct((gn, gs, w), x.dtype),
            jax.ShapeDtypeStruct((gn, gs, 1), jnp.float32),
            jax.ShapeDtypeStruct((gn, gs, 1), jnp.float32),
        ),
        grid=(gn,),
        in_specs=[
            pl.BlockSpec((1, gs, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, gs, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gs, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gs, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        compiler_params=_PARALLEL_GRID,
    )(x, gamma2, beta2)
    if (gn, gs) != (n, s):
        y = y.reshape(n, s, w)
        mean = mean.reshape(n, s, 1)
        rstd = rstd.reshape(n, s, 1)
    return y, mean, rstd


def _ln_bwd_impl(x, gamma, mean, rstd, g):
    n, s, w = x.shape
    gn, gs = _grid_layout(n, s)
    if (gn, gs) != (n, s):
        x = x.reshape(gn, gs, w)
        mean = mean.reshape(gn, gs, 1)
        rstd = rstd.reshape(gn, gs, 1)
        g = g.reshape(gn, gs, w)
    gamma2 = gamma.reshape(1, w)
    dx, dgamma_parts, dbeta_parts = pl.pallas_call(
        _ln_bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((gn, gs, w), x.dtype),
            jax.ShapeDtypeStruct((gn, 1, w), jnp.float32),
            jax.ShapeDtypeStruct((gn, 1, w), jnp.float32),
        ),
        grid=(gn,),
        in_specs=[
            pl.BlockSpec((1, gs, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gs, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gs, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gs, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, gs, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        compiler_params=_PARALLEL_GRID,
    )(x, gamma2, mean, rstd, g)
    dgamma = jnp.sum(dgamma_parts, axis=(0, 1))
    dbeta = jnp.sum(dbeta_parts, axis=(0, 1))
    if (gn, gs) != (n, s):
        dx = dx.reshape(n, s, w)
    return dx, dgamma, dbeta


def _lnres_fwd_kernel(x_ref, d_ref, gamma_ref, beta_ref,
                      r_ref, y_ref, mean_ref, rstd_ref, *, eps: float):
    r = x_ref[0].astype(jnp.float32) + d_ref[0].astype(jnp.float32)  # [S, W]
    w = r.shape[-1]
    r_ref[0] = r.astype(r_ref.dtype)
    mean = jnp.sum(r, axis=-1, keepdims=True) / w
    rc = r - mean
    var = jnp.sum(rc * rc, axis=-1, keepdims=True) / w
    rstd = jax.lax.rsqrt(var + eps)
    y = rc * rstd * gamma_ref[0].astype(jnp.float32) + beta_ref[0].astype(jnp.float32)
    y_ref[0] = y.astype(y_ref.dtype)
    mean_ref[0] = mean
    rstd_ref[0] = rstd


def _lnres_bwd_kernel(r_ref, gamma_ref, mean_ref, rstd_ref, gr_ref, gy_ref,
                      dr_ref, dgamma_ref, dbeta_ref):
    r = r_ref[0].astype(jnp.float32)
    gy = gy_ref[0].astype(jnp.float32)
    gamma = gamma_ref[0].astype(jnp.float32)
    mean = mean_ref[0]
    rstd = rstd_ref[0]
    w = r.shape[-1]

    rhat = (r - mean) * rstd
    dyhat = gy * gamma
    m1 = jnp.sum(dyhat, axis=-1, keepdims=True) / w
    m2 = jnp.sum(dyhat * rhat, axis=-1, keepdims=True) / w
    dr = rstd * (dyhat - m1 - rhat * m2) + gr_ref[0].astype(jnp.float32)
    dr_ref[0] = dr.astype(dr_ref.dtype)
    dgamma_ref[0] = jnp.sum(gy * rhat, axis=0, keepdims=True)
    dbeta_ref[0] = jnp.sum(gy, axis=0, keepdims=True)


def _lnres_fwd_impl(x, delta, gamma, beta, eps):
    n, s, w = x.shape
    gn, gs = _grid_layout(n, s)
    if (gn, gs) != (n, s):
        x = x.reshape(gn, gs, w)
        delta = delta.reshape(gn, gs, w)
    slab = lambda i: (i, 0, 0)
    vec = lambda i: (0, 0)
    r, y, mean, rstd = pl.pallas_call(
        functools.partial(_lnres_fwd_kernel, eps=eps),
        out_shape=(
            jax.ShapeDtypeStruct((gn, gs, w), x.dtype),
            jax.ShapeDtypeStruct((gn, gs, w), x.dtype),
            jax.ShapeDtypeStruct((gn, gs, 1), jnp.float32),
            jax.ShapeDtypeStruct((gn, gs, 1), jnp.float32),
        ),
        grid=(gn,),
        in_specs=[
            pl.BlockSpec((1, gs, w), slab, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gs, w), slab, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w), vec, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, gs, w), slab, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gs, w), slab, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gs, 1), slab, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gs, 1), slab, memory_space=pltpu.VMEM),
        ),
        compiler_params=_PARALLEL_GRID,
    )(x, delta, gamma.reshape(1, w), beta.reshape(1, w))
    if (gn, gs) != (n, s):
        r = r.reshape(n, s, w)
        y = y.reshape(n, s, w)
        mean = mean.reshape(n, s, 1)
        rstd = rstd.reshape(n, s, 1)
    return r, y, mean, rstd


def _lnres_bwd_impl(r, gamma, mean, rstd, gr, gy):
    n, s, w = r.shape
    gn, gs = _grid_layout(n, s)
    if (gn, gs) != (n, s):
        r = r.reshape(gn, gs, w)
        mean = mean.reshape(gn, gs, 1)
        rstd = rstd.reshape(gn, gs, 1)
        gr = gr.reshape(gn, gs, w)
        gy = gy.reshape(gn, gs, w)
    slab = lambda i: (i, 0, 0)
    dr, dgamma_parts, dbeta_parts = pl.pallas_call(
        _lnres_bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((gn, gs, w), r.dtype),
            jax.ShapeDtypeStruct((gn, 1, w), jnp.float32),
            jax.ShapeDtypeStruct((gn, 1, w), jnp.float32),
        ),
        grid=(gn,),
        in_specs=[
            pl.BlockSpec((1, gs, w), slab, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gs, 1), slab, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gs, 1), slab, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gs, w), slab, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gs, w), slab, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, gs, w), slab, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, w), slab, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, w), slab, memory_space=pltpu.VMEM),
        ),
        compiler_params=_PARALLEL_GRID,
    )(r, gamma.reshape(1, w), mean, rstd, gr, gy)
    dgamma = jnp.sum(dgamma_parts, axis=(0, 1))
    dbeta = jnp.sum(dbeta_parts, axis=(0, 1))
    if (gn, gs) != (n, s):
        dr = dr.reshape(n, s, w)
    return dr, dgamma, dbeta


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def layer_norm_residual(x, delta, gamma, beta, eps: float = 1e-5):
    """Fused residual-add + LayerNorm: r = x + delta, y = ln(r) * gamma + beta.

    Returns (r, y). Saves the separate XLA residual-add pass over HBM
    (measured ~0.8 ms per add over [32, 513, 1024] on v5e) and, in the
    backward, folds the two incoming cotangents (d r from downstream use of
    the residual stream, d y from the norm consumer) into one kernel."""
    r, y, _, _ = _lnres_fwd_impl(x, delta, gamma, beta, eps)
    return r, y


def _lnres_vjp_fwd(x, delta, gamma, beta, eps):
    r, y, mean, rstd = _lnres_fwd_impl(x, delta, gamma, beta, eps)
    return (r, y), (r, gamma, mean, rstd)


def _lnres_vjp_bwd(eps, res, cts):
    r, gamma, mean, rstd = res
    gr, gy = cts
    dr, dgamma, dbeta = _lnres_bwd_impl(r, gamma, mean, rstd, gr, gy)
    return dr, dr, dgamma.astype(gamma.dtype), dbeta.astype(gamma.dtype)


layer_norm_residual.defvjp(_lnres_vjp_fwd, _lnres_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def layer_norm(x, gamma, beta, eps: float = 1e-5):
    """LayerNorm over the last dim of x [N, S, W]; f32 statistics, x-dtype IO.

    Numerically equivalent to flax nn.LayerNorm(dtype=f32) followed by a cast
    back to x.dtype (the denoiser consumes bf16 either way)."""
    y, _, _ = _ln_fwd_impl(x, gamma, beta, eps)
    return y


def _layer_norm_fwd(x, gamma, beta, eps):
    y, mean, rstd = _ln_fwd_impl(x, gamma, beta, eps)
    return y, (x, gamma, mean, rstd)


def _layer_norm_bwd(eps, res, g):
    x, gamma, mean, rstd = res
    dx, dgamma, dbeta = _ln_bwd_impl(x, gamma, mean, rstd, g)
    return dx, dgamma.astype(gamma.dtype), dbeta.astype(gamma.dtype)


layer_norm.defvjp(_layer_norm_fwd, _layer_norm_bwd)
