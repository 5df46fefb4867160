"""Fused small-MLP Pallas kernel (fwd + bwd) for the PointNeRF hot loop.

The stage-1 aggregation runs a 5-layer 256-wide MLP over ~18M (shading
point, neighbor) pairs per train step. XLA materializes every intermediate
[pairs, 256] activation in HBM (fwd ~1.3 GB/layer/chunk of traffic, bwd
more), which measured ~0.5 s of the ~1.0 s step on v5e. This kernel keeps
the whole layer stack in VMEM:

  * all weights live in VMEM for every grid program (the SRN config's
    local_field is ~0.33M params ~= 1.3 MB f32)
  * input stays in its [B, M, C] layout — blocks map straight out of the
    aggregation tensor, no HBM reshape/pad/slice round trips (a first
    version padded/flattened outside the kernel; the extra full passes over
    the 0.4 GB/chunk activation cost more than the kernel saved)
  * ragged last row-block handled by in-kernel masking of the cotangent
    (forward stores are masked by Mosaic automatically)
  * backward recomputes hidden activations per block (flash-style), emits
    dx blocks, accumulates dW/db in f32 VMEM scratch across the sequential
    TPU grid, and stores them once at the final program

Numerics match nn_core.apply_mlp exactly: f32 MXU accumulation, cast to the
weight dtype between layers, bias add in weight dtype, leaky_relu as
max(x, 0.01x).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLK = 1024


def _act(h):
    return jnp.maximum(h, 0.01 * h)


def _act_grad(z):
    return jnp.where(z > 0, 1.0, 0.01)


def _layer(h, w_ref, b_ref):
    w = w_ref[...]
    z = jax.lax.dot(
        h, w, preferred_element_type=jnp.float32
    ).astype(w.dtype) + b_ref[...]
    return z


def _fwd_kernel(x_ref, *refs, n_layers: int, final_linear: bool):
    o_ref = refs[-1]
    h = x_ref[0]
    for i in range(n_layers):
        h = _layer(h, refs[2 * i], refs[2 * i + 1])
        if not (final_linear and i == n_layers - 1):
            h = _act(h)
    o_ref[0] = h.astype(o_ref.dtype)


def _bwd_kernel(x_ref, *refs, n_layers: int, final_linear: bool, rows: int):
    # refs: w0, b0, ..., g  |  outs: dx, dw0, db0, ...  |  scratch: acc_*
    n_in = 2 * n_layers + 1
    g_ref = refs[n_in - 1]
    dx_ref = refs[n_in]
    dw_refs = refs[n_in + 1 : n_in + 1 + 2 * n_layers]
    acc_refs = refs[n_in + 1 + 2 * n_layers :]

    b_i = pl.program_id(0)
    blk_j = pl.program_id(1)
    nb = pl.num_programs(0)
    nj = pl.num_programs(1)

    @pl.when((b_i == 0) & (blk_j == 0))
    def _zero():
        for a in acc_refs:
            a[...] = jnp.zeros_like(a)

    # forward recompute, keeping each layer's input. Mask input rows beyond
    # the logical row count: the ragged last block's out-of-bounds loads are
    # undefined and would poison dW = h^T g even with g zeroed (0 * NaN).
    x = x_ref[0]
    blk = x.shape[0]
    row = blk_j * blk + jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0)
    row_ok = row < rows
    hs = [jnp.where(row_ok, x, 0)]
    h = hs[0]
    zs = []
    for l in range(n_layers):
        z = _layer(h, refs[2 * l], refs[2 * l + 1])
        zs.append(z)
        h = z if (final_linear and l == n_layers - 1) else _act(z)
        if l < n_layers - 1:
            hs.append(h)

    # mask cotangent rows beyond the logical row count as well (their dW
    # contribution must be exactly zero)
    g = jnp.where(row_ok, g_ref[0].astype(jnp.float32), 0.0)

    for l in range(n_layers - 1, -1, -1):
        if not (final_linear and l == n_layers - 1):
            g = g * _act_grad(zs[l].astype(jnp.float32))
        acc_refs[2 * l][...] += jax.lax.dot_general(
            hs[l].astype(jnp.float32), g,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_refs[2 * l + 1][...] += jnp.sum(g, axis=0, keepdims=True)
        w = refs[2 * l][...].astype(jnp.float32)
        g = jax.lax.dot_general(
            g, w,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    dx_ref[0] = g.astype(dx_ref.dtype)

    @pl.when((b_i == nb - 1) & (blk_j == nj - 1))
    def _store():
        for dw_ref, acc_ref in zip(dw_refs, acc_refs):
            dw_ref[...] = acc_ref[...]


def _w_specs(weights):
    specs = []
    for w, b in weights:
        specs.append(pl.BlockSpec(w.shape, lambda i, j: (0, 0),
                                  memory_space=pltpu.VMEM))
        specs.append(pl.BlockSpec((1, b.shape[-1]), lambda i, j: (0, 0),
                                  memory_space=pltpu.VMEM))
    return specs


def _flat_weights(weights):
    flat = []
    for w, b in weights:
        flat += [w, b.reshape(1, -1)]
    return flat


def _grid_and_blk(b, m):
    blk = min(_BLK, m)
    return (b, pl.cdiv(m, blk)), blk


def _fwd_impl(x, weights, final_linear):
    b, m, _ = x.shape
    n_layers = len(weights)
    d_out = weights[-1][0].shape[1]
    grid, blk = _grid_and_blk(b, m)
    row = lambda d: pl.BlockSpec((1, blk, d), lambda i, j: (i, j, 0),
                                 memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, n_layers=n_layers,
                          final_linear=final_linear),
        out_shape=jax.ShapeDtypeStruct((b, m, d_out), x.dtype),
        grid=grid,
        in_specs=[row(x.shape[-1])] + _w_specs(weights),
        out_specs=row(d_out),
    )(x, *_flat_weights(weights))


def _bwd_impl(x, weights, g, final_linear):
    b, m, d_in = x.shape
    n_layers = len(weights)
    grid, blk = _grid_and_blk(b, m)
    row = lambda d: pl.BlockSpec((1, blk, d), lambda i, j: (i, j, 0),
                                 memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i, j: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    w_shapes = []
    for w, bias in weights:
        w_shapes += [w.shape, (1, bias.shape[-1])]

    out_shapes = [jax.ShapeDtypeStruct((b, m, d_in), x.dtype)]
    out_specs = [row(d_in)]
    for s in w_shapes:
        out_shapes.append(jax.ShapeDtypeStruct(s, jnp.float32))
        out_specs.append(full(s))
    scratch = [pltpu.VMEM(s, jnp.float32) for s in w_shapes]

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, n_layers=n_layers,
                          final_linear=final_linear, rows=m),
        out_shape=tuple(out_shapes),
        grid=grid,
        in_specs=[row(d_in)] + _w_specs(weights) + [row(g.shape[-1])],
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
    )(x, *_flat_weights(weights), g)
    dx = outs[0]
    dws = []
    for l in range(n_layers):
        w, bias = weights[l]
        dws.append((outs[1 + 2 * l].astype(w.dtype),
                    outs[2 + 2 * l].reshape(bias.shape).astype(bias.dtype)))
    return dx, tuple(dws)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_mlp(x: jnp.ndarray, weights: Tuple[Tuple[jnp.ndarray, jnp.ndarray], ...],
              final_linear: bool = True) -> jnp.ndarray:
    """x: [B, M, d_in]; weights: ((w [di, do], b [do]), ...) -> [B, M, d_out].

    leaky_relu(0.01) after every layer except the last when final_linear —
    the nn_core.apply_mlp contract."""
    return _fwd_impl(x, weights, final_linear)


def _vjp_fwd(x, weights, final_linear):
    return _fwd_impl(x, weights, final_linear), (x, weights)


def _vjp_bwd(final_linear, res, g):
    x, weights = res
    dx, dws = _bwd_impl(x, weights, g, final_linear)
    return dx, dws


fused_mlp.defvjp(_vjp_fwd, _vjp_bwd)
