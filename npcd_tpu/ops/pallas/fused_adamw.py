"""Streaming AdamW+EMA Pallas kernel (per-leaf, multi-output, one pass).

Why not XLA: the per-leaf update closure in train/fused_update.py lowers
to a multi-output loop fusion, and the TPU emitter re-reads inputs per
output — measured ~270 GB/s effective on the 302M-param denoiser update
(40.4 ms/step) vs the ~13 ms HBM roofline.  This kernel streams each
(grad, param, mu, nu, ema...) block through VMEM exactly once and writes
(param, mu, nu, ema...) exactly once, with the pre-clip sum-of-squares
(for the grad-norm metric) accumulated on the way through.

Same math as train/fused_update.FusedAdamWEma.update's closure (itself
pinned against optax+ema_update by tests/test_fused_update.py); the
kernel is pinned against the closure by tests/test_fused_adamw_kernel.py.

Eligibility: 2-D f32 leaves with lane-aligned columns (C % 128 == 0) and
rows divisible by the row block.  Everything else (biases, scalars, the
35-column output_proj) stays on the XLA closure — a negligible fraction
of the parameter bytes.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-buffer block target: with n_ema=1 there are 9 streamed buffers,
# double-buffered, against the default ~16 MB scoped-vmem limit ->
# 9 * 2 * 0.75 MB = 13.5 MB
_TARGET_BLOCK_BYTES = 768 * 1024


def _kernel(scalars_ref, g_ref, p_ref, mu_ref, nu_ref, *refs,
            n_ema: int, b1: float, b2: float, eps: float, lr: float,
            wd: float, use_clip: bool):
    ema_refs = refs[:n_ema]
    p_out, mu_out, nu_out = refs[n_ema:n_ema + 3]
    ema_outs = refs[n_ema + 3:n_ema + 3 + n_ema]
    sumsq_ref = refs[2 * n_ema + 3]

    g = g_ref[...]
    sumsq_ref[pl.program_id(0), 0] = jnp.sum(g * g)
    if use_clip:
        g = g * scalars_ref[2]
    bc1 = scalars_ref[0]
    bc2 = scalars_ref[1]
    mu2 = (1.0 - b1) * g + b1 * mu_ref[...]
    nu2 = (1.0 - b2) * (g * g) + b2 * nu_ref[...]
    p = p_ref[...]
    upd = (mu2 / bc1) / (jnp.sqrt(nu2 / bc2) + eps)
    p2 = p + (-lr) * (upd + wd * p)
    p_out[...] = p2
    mu_out[...] = mu2
    nu_out[...] = nu2
    for i in range(n_ema):
        d = scalars_ref[3 + i]
        e = ema_refs[i][...].astype(jnp.float32)
        ema_outs[i][...] = (e * d + p2 * (1.0 - d)).astype(ema_outs[i].dtype)


def _pick_block_rows(rows: int, cols: int) -> Optional[int]:
    """Largest row-block <= the VMEM byte target that divides `rows`.
    Returns None when the divisor search lands on a non-sublane-aligned
    block (b % 8 != 0, e.g. odd row counts): leaf_eligible then routes the
    leaf to the XLA fallback instead of relying on Mosaic masking of
    misaligned tiles."""
    target = max(8, _TARGET_BLOCK_BYTES // (cols * 4))
    b = min(rows, target)
    while b > 1 and rows % b:
        b -= 1
    return b if b % 8 == 0 else None


def leaf_eligible(x) -> bool:
    return (
        x.ndim == 2
        and x.dtype == jnp.float32
        and x.shape[1] % 128 == 0
        and x.size >= 128 * 1024
        and _pick_block_rows(x.shape[0], x.shape[1]) is not None
    )


def adamw_ema_leaf(
    scalars: jnp.ndarray,   # f32[3 + n_ema]: bc1, bc2, clip_scale, decays...
    g: jnp.ndarray,
    p: jnp.ndarray,
    mu: jnp.ndarray,
    nu: jnp.ndarray,
    emas: Sequence[jnp.ndarray],
    *,
    b1: float, b2: float, eps: float, lr: float, wd: float,
    use_clip: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, Tuple[jnp.ndarray, ...], jnp.ndarray]:
    """One-pass AdamW+EMA update of a single [R, C] f32 leaf.

    Returns (p2, mu2, nu2, emas2, sumsq) where sumsq is the PRE-clip
    sum(g*g) over the leaf (f32 scalar)."""
    rows, cols = g.shape
    n_ema = len(emas)
    br = _pick_block_rows(rows, cols)
    grid = rows // br

    def row_block(i):
        return (i, 0)

    block = pl.BlockSpec((br, cols), row_block, memory_space=pltpu.VMEM)
    scal = pl.BlockSpec(memory_space=pltpu.SMEM)
    outs = pl.pallas_call(
        functools.partial(
            _kernel, n_ema=n_ema, b1=b1, b2=b2, eps=eps, lr=lr, wd=wd,
            use_clip=use_clip,
        ),
        grid=(grid,),
        in_specs=[scal, block, block, block, block] + [block] * n_ema,
        out_specs=tuple([block] * (3 + n_ema))
        # full-array SMEM block (revisited by every program; each writes its
        # own row) — per-program (1, 1) blocks are not lowerable on TPU
        + (pl.BlockSpec((grid, 1), lambda i: (0, 0),
                        memory_space=pltpu.SMEM),),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((rows, cols), jnp.float32)] * 3
            + [jax.ShapeDtypeStruct((rows, cols), e.dtype) for e in emas]
        )
        + (jax.ShapeDtypeStruct((grid, 1), jnp.float32),),
        # in-place: p/mu/nu/ema inputs alias their outputs (donation-friendly)
        input_output_aliases={2: 0, 3: 1, 4: 2,
                              **{5 + i: 3 + i for i in range(n_ema)}},
    )(scalars, g, p, mu, nu, *emas)
    p2, mu2, nu2 = outs[0], outs[1], outs[2]
    emas2 = tuple(outs[3:3 + n_ema])
    sumsq = jnp.sum(outs[3 + n_ema])
    return p2, mu2, nu2, emas2, sumsq
