"""Fused attention Pallas kernel for the NPCD denoiser.

TPU-native replacement for the reference's CUDA flash-attn call
(npcd/models/diffusion/denoisers/transformer.py:75). The denoiser sequence is
short (512 points + 1 time token = 513), so the whole KV block fits in VMEM:
each grid program computes one (batch*head, q-block) tile with a single
masked softmax — no online-softmax streaming required. Padded key positions
(introduced to align S to the 128-lane TPU tiling) are masked to -inf before
the softmax.

The backward pass is delegated to XLA autodiff of the mathematically
identical einsum formulation via jax.custom_vjp: at S~513 the recompute is
cheap and keeps the kernel surface minimal.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, seq_len: int, sm_scale: float):
    q = q_ref[0].astype(jnp.float32)  # [BQ, D]
    k = k_ref[0].astype(jnp.float32)  # [S_pad, D]
    v = v_ref[0].astype(jnp.float32)  # [S_pad, D]

    logits = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * sm_scale  # [BQ, S_pad]

    s_pad = logits.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(col < seq_len, logits, -jnp.inf)

    m = jnp.max(logits, axis=-1, keepdims=True)
    unnorm = jnp.exp(logits - m)
    denom = jnp.sum(unnorm, axis=-1, keepdims=True)
    weights = unnorm / denom

    out = jnp.dot(weights, v, preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _flash_attention_fwd_impl(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """q, k, v: [B, S, H, D] -> [B, S, H, D]."""
    b, s, h, d = q.shape
    s_pad = _round_up(s, _LANE)
    bq = min(s_pad, 512)

    def to_bh(x):
        # [B, S, H, D] -> [B*H, S_pad, D]
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, s, d)
        if s_pad != s:
            x = jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0)))
        return x

    qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)

    grid = (b * h, s_pad // bq)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, seq_len=s, sm_scale=1.0 / (d ** 0.5)),
        out_shape=jax.ShapeDtypeStruct((b * h, s_pad, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
    )(qb, kb, vb)

    out = out[:, :s].reshape(b, h, s, d)
    return jnp.transpose(out, (0, 2, 1, 3))


def _einsum_reference(q, k, v):
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.sqrt(jnp.asarray(d, jnp.float32))).astype(q.dtype)
    logits = jnp.einsum("bthc,bshc->bhts", q * scale, k * scale)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhts,bshc->bthc", weights, v)


@jax.custom_vjp
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return _flash_attention_fwd_impl(q, k, v)


def _fwd(q, k, v):
    return _flash_attention_fwd_impl(q, k, v), (q, k, v)


def _bwd(res, g):
    q, k, v = res
    _, vjp = jax.vjp(_einsum_reference, q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)
