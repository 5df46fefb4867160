"""Fused attention Pallas kernel for the NPCD denoiser.

TPU-native replacement for the reference's CUDA flash-attn call
(npcd/models/diffusion/denoisers/transformer.py:75). The denoiser sequence is
short (512 points + 1 time token = 513), so the whole KV block fits in VMEM:
each grid program computes one (batch*head, q-block) tile with a single
masked softmax — no online-softmax streaming required. Padded key positions
(introduced to align S to the 128-lane TPU tiling) are masked to -inf before
the softmax.

The backward pass is a second Pallas kernel (one grid program per
batch*head): it recomputes the S x S attention probabilities from (q, k)
in VMEM — ~1.6 MB at S_pad=640, far below the 16 MB budget — and emits
dq/dk/dv with five MXU matmuls, so no [B, H, S, S] tensor ever
materializes in HBM in either direction (the reference's CUDA flash-attn
has the same property, npcd/models/diffusion/denoisers/transformer.py:75).
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


_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _attn_bwd_kernel(
    q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
    *, seq_len: int, sm_scale: float,
):
    """Flash-attention backward for one (batch*head) slice.

    Recomputes P = softmax(QK^T * scale) with padded key columns masked to a
    large negative value (finite, so fully-padded query rows softmax to a
    uniform distribution instead of NaN; their dO is zero after the caller
    slices off padded outputs, so they contribute nothing), then

        dV = P^T dO
        dP = dO V^T
        dS = P * (dP - rowsum(P * dP)) * scale
        dQ = dS K,  dK = dS^T Q
    """
    q = q_ref[0].astype(jnp.float32)    # [S_pad, D]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)

    logits = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * sm_scale  # [S_pad, S_pad]
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(col < seq_len, logits, _MASK_VALUE)

    m = jnp.max(logits, axis=-1, keepdims=True)
    unnorm = jnp.exp(logits - m)
    p = unnorm / jnp.sum(unnorm, axis=-1, keepdims=True)  # [S_pad, S_pad]

    dv = jax.lax.dot_general(
        p, do,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [S_pad, D]
    dp = jax.lax.dot_general(
        do, v,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [S_pad, S_pad]
    delta = jnp.sum(p * dp, axis=-1, keepdims=True)  # [S_pad, 1]
    ds = p * (dp - delta) * sm_scale

    dq = jnp.dot(ds, k, preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(
        ds, q,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_attention_bwd_impl(q, k, v, g):
    """q, k, v, g: [B, S, H, D] -> (dq, dk, dv) each [B, S, H, D]."""
    b, s, h, d = q.shape
    s_pad = _round_up(s, _LANE)

    def to_bh(x):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, s, d)
        if s_pad != s:
            x = jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0)))
        return x

    qb, kb, vb, gb = to_bh(q), to_bh(k), to_bh(v), to_bh(g)

    full = pl.BlockSpec(
        (1, s_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    shape = jax.ShapeDtypeStruct((b * h, s_pad, d), q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _attn_bwd_kernel, seq_len=s, sm_scale=1.0 / (d ** 0.5)
        ),
        out_shape=(shape, shape, shape),
        grid=(b * h,),
        in_specs=[full, full, full, full],
        out_specs=(full, full, full),
    )(qb, kb, vb, gb)

    def from_bh(x):
        x = x[:, :s].reshape(b, h, s, d)
        return jnp.transpose(x, (0, 2, 1, 3))

    return from_bh(dq), from_bh(dk), from_bh(dv)


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
    return _flash_attention_bwd_impl(q, k, v, g)


flash_attention.defvjp(_fwd, _bwd)
