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
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLK = 1024

# Separate pair-block caps for the posenc fwd/bwd kernels (A/B-tunable via
# env, read at import). The bwd's VMEM high-water (pre-activation
# residuals + f32 dW accumulators) caps its block at 2048 (3584 needs
# 25.7M vs the 16M scoped-vmem limit; 2048 only fits since the r04b
# residual slimming — act(z) re-derived in the backward walk); the fwd
# keeps only one live activation, so larger blocks amortize per-program
# overhead. Measured v5e (tools/ab_blk.py, production shapes b=400
# m=14336 k=8): fwd 21.23 ms @1024 -> 20.50 @2048 -> 20.09 @3584
# -> 19.77 @7168 (vs ~16.7 ms MXU floor); bwd-only 51.85 ms @1024 ->
# 51.34 @2048.
import os as _os

_BLK_FWD = int(_os.environ.get("NPCD_FUSED_MLP_BLK_FWD", 7168))
_BLK_BWD = int(_os.environ.get("NPCD_FUSED_MLP_BLK_BWD", 2048))

# Backward-dot precision. The MXU's full rate is bf16; with "1" (default)
# the backward walks the cotangent chain in f32 on the VPU (act-grad
# multiplies, bias row-sums) but feeds the dW/dX dots bf16 operands with
# f32 accumulation — exactly the numerics XLA's autodiff gives a bf16
# network, where inter-layer cotangents are bf16 tensors. "0" keeps full
# f32 dot operands (the pre-r04 behavior) for parity debugging.
_BF16_BWD = _os.environ.get("NPCD_FUSED_MLP_BF16_BWD", "1") == "1"

# In-kernel fwd sub-blocking (see _fwd_posenc_kernel); 1 = off (default).
# Measured NEUTRAL at the production shape (fwd blk 7168: 19.77 ms at
# subblk 1 vs 19.97 at subblk 2, v5e) — Mosaic already overlaps the
# posenc VPU chain with the layer dots; kept as a knob for other shapes.
_FWD_SUBBLK = int(_os.environ.get("NPCD_FUSED_MLP_FWD_SUBBLK", "1"))


def _kdot(a, b, dimension_numbers):
    """f32-accumulating dot_general for kernel bodies, HIGH-precision aware.

    Mosaic lowers only DEFAULT and HIGHEST dot precisions
    (NotImplementedError: Unsupported dot precision: HIGH), so an ambient
    jax.default_matmul_precision('tensorfloat32'/'high') — the bf16x3
    middle setting XLA gives every non-Pallas dot natively — would fail to
    compile through these kernels. Emulate it instead: split each f32
    operand into bf16 hi + bf16 lo (lo captures the next 8 mantissa bits)
    and run the bf16x3 algorithm as three DEFAULT single-pass MXU dots,
    a_hi@b_hi + a_hi@b_lo + a_lo@b_hi, accumulated in f32 — the same
    operand-error class (~2^-16 vs DEFAULT's ~2^-8) at 3 passes instead
    of HIGHEST's 6. bf16 operands pin DEFAULT (HIGH is meaningless for
    them and would also fail Mosaic). Ambient DEFAULT/HIGHEST inherit
    unchanged. The ambient precision is part of the jit trace context, so
    mode switches retrace correctly."""
    prec = str(getattr(jax.config, "jax_default_matmul_precision", None))
    if prec in ("tensorfloat32", "high"):
        if a.dtype == jnp.float32 and b.dtype == jnp.float32:
            ah = a.astype(jnp.bfloat16)
            al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
            bh = b.astype(jnp.bfloat16)
            bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
            d = functools.partial(
                jax.lax.dot_general, dimension_numbers=dimension_numbers,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
            return d(ah, bh) + (d(ah, bl) + d(al, bh))
        return jax.lax.dot_general(
            a, b, dimension_numbers, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)
    return jax.lax.dot_general(
        a, b, dimension_numbers, preferred_element_type=jnp.float32)


def _act(h):
    return jnp.maximum(h, 0.01 * h)


def _act_grad(z):
    return jnp.where(z > 0, 1.0, 0.01)


def _layer(h, w_ref, b_ref):
    w = w_ref[...]
    z = _kdot(
        h, w, (((1,), (0,)), ((), ()))
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

    cd = refs[0].dtype
    lowp = _BF16_BWD and cd == jnp.bfloat16
    for l in range(n_layers - 1, -1, -1):
        if not (final_linear and l == n_layers - 1):
            g = g * _act_grad(zs[l].astype(jnp.float32))
        gd = g.astype(cd) if lowp else g
        acc_refs[2 * l][...] += _kdot(
            hs[l].astype(cd if lowp else jnp.float32), gd,
            (((0,), (0,)), ((), ())),
        )
        acc_refs[2 * l + 1][...] += jnp.sum(g, axis=0, keepdims=True)
        w = refs[2 * l][...]
        g = _kdot(
            gd, w if lowp else w.astype(jnp.float32),
            (((1,), (1,)), ((), ())),
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


def _grid_and_blk(b, m, cap=_BLK):
    blk = min(cap, m)
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


# ---------------------------------------------------------------------------
# Posenc-fused variant: the aggregation MLP's input is
# concat([nb_feat, x_rel, posenc(x_rel)]) — materializing that [pairs, 95]
# tensor plus the sin/cos octaves in HBM cost ~14 ms/step of pure
# bandwidth at the SRN stage-1 geometry (pad_maximum 8.3 + posenc fusion
# 5.8, docs/PERF.md r03b breakdown). Here the kernel receives only the
# compact transposed inputs
#
#   feat_t [B, F, M]  (gathered neighbor features, compute dtype)
#   pos_t  [B, 8, M]  (x_rel on sublane rows 0..pos_dim-1, f32)
#
# and builds the 95-row layer-1 input in VMEM. No transposes anywhere:
# layer 1 contracts over SUBLANES (z1 = h0_t^T W1 via dot_general), so the
# transposed layout is the natural one for the MXU, and the [*, <128]-minor
# HBM tiling inflation of narrow row-major tensors never happens.
#
# In-kernel encoding rows are OCTAVE-major ([x, sin_0(xyz), sin_1(xyz), ...,
# cos_0(xyz), ...]) because they are built by sublane concatenation of
# [pos_dim, blk] pieces; the caller's W1 uses the reference's DIM-major
# column order (nn_core.positional_encoding), so the wrapper permutes W1's
# rows once on entry and inverse-permutes dW1 on exit.
#
# Octave values use the same double-angle recurrence as
# nn_core.positional_encoding(method='recurrence') — bit-identical forward.
# The backward applies the analytic derivative d sin(2^j b)/db = 2^j cos_j
# on the recurrence's own sin/cos values (equal to autodiff-of-the-
# recurrence up to f32 rounding).


def _posenc_rows(xp, n_freqs: int, freq_mult: float, method: str):
    """xp [pos_dim, blk] f32 -> (sins, coss): n_freqs pieces of
    [pos_dim, blk] each. Both nn_core.positional_encoding methods:
    'direct' evaluates sin/cos(2^j fm pi x) per octave (reference
    op-for-op); 'recurrence' uses the double-angle identities."""
    if method == "direct":
        base = (freq_mult * math.pi) * xp
        sins = [jnp.sin(float(2 ** j) * base) for j in range(n_freqs)]
        coss = [jnp.cos(float(2 ** j) * base) for j in range(n_freqs)]
        return sins, coss
    anchor_every = 5 if method == "anchored" else n_freqs
    sins, coss = [], []
    for g0 in range(0, n_freqs, anchor_every):
        base = (freq_mult * float(2 ** g0) * math.pi) * xp
        s, c = jnp.sin(base), jnp.cos(base)
        sins.append(s)
        coss.append(c)
        for _ in range(min(anchor_every, n_freqs - g0) - 1):
            s, c = 2.0 * s * c, 2.0 * c * c - 1.0
            sins.append(s)
            coss.append(c)
    return sins, coss


def _build_h0t(xf, xp, *, pos_dim: int, n_freqs: int,
               freq_mult: float, method: str, rows_pad: int, lane_ok):
    """xf [F, blk] compute dtype, xp [pos_dim, blk] f32 ->
    ([D1K, blk] layer-1 input (transposed), sins, coss)."""
    if lane_ok is not None:
        # mask OOB lanes of the ragged last block BEFORE sin/cos: undefined
        # loads could be Inf -> sin(Inf) = NaN, which would poison dW1 even
        # against a zeroed cotangent (0 * NaN)
        xf = jnp.where(lane_ok, xf, 0)
        xp = jnp.where(lane_ok, xp, 0.0)
    sins, coss = _posenc_rows(xp, n_freqs, freq_mult, method)
    cd = xf.dtype
    pieces = [xf, xp.astype(cd)] + [s.astype(cd) for s in sins] + [
        c.astype(cd) for c in coss]
    if rows_pad:
        pieces.append(jnp.zeros((rows_pad, xf.shape[1]), cd))
    return jnp.concatenate(pieces, axis=0), sins, coss


def _w_col(w_row, lane_ok, blk: int):
    """Per-pair weight as a column [blk, 1] f32: w_row is pos row 3 as
    [1, blk] lane-major; zero OOB lanes of a ragged block, relayout to
    sublanes. The 1-D relayout is a few hundred cycles — an earlier
    block-diagonal-selector MXU formulation cost k*npts/1 redundant dot
    work (~10 ms/step at the SRN geometry, measured perf-neutral)."""
    wv = jnp.where(lane_ok, w_row, 0.0)  # [1, blk] f32
    return wv.reshape(blk, 1)


def _wsum_reduce(h, w_col, k: int):
    """out[n] = sum_j w[n*k+j] * h[n*k+j]: VPU multiply + sublane-group
    reduce (pairs of one point are consecutive sublanes)."""
    blk, d = h.shape
    wh = h.astype(jnp.float32) * w_col
    return jnp.sum(wh.reshape(blk // k, k, d), axis=1)


def _fwd_posenc_kernel(f_ref, p_ref, *refs, n_layers: int, final_linear: bool,
                       pos_dim: int, n_freqs: int, freq_mult: float,
                       method: str, rows_pad: int, reduce_k: int, rows: int):
    o_ref = refs[-1]
    blk = f_ref.shape[-1]
    # In-kernel sub-blocking (NPCD_FUSED_MLP_FWD_SUBBLK > 1): the posenc
    # build is a VPU chain that otherwise serializes ahead of the MXU
    # dots; independent sub-blocks inside ONE program let the compiler
    # overlap sub-block t+1's sin/cos with sub-block t's layer dots while
    # keeping the per-program overhead of the large block.
    nsub = _FWD_SUBBLK
    if not (nsub > 1 and blk % nsub == 0
            and (not reduce_k or (blk // nsub) % (8 * reduce_k) == 0)):
        nsub = 1
    sub = blk // nsub
    for t in range(nsub):
        sl = slice(t * sub, (t + 1) * sub)
        xf = f_ref[0][:, sl]
        xp = p_ref[0][:pos_dim, sl]
        lane_ok = None
        if reduce_k:
            # the reduction dot sums every lane into each output row, so
            # ragged OOB lanes must be finite (0 * NaN = NaN in an MXU dot)
            lane = (pl.program_id(1) * blk + t * sub
                    + jax.lax.broadcasted_iota(jnp.int32, (1, sub), 1))
            lane_ok = lane < rows
        h0t, _, _ = _build_h0t(xf, xp, pos_dim=pos_dim, n_freqs=n_freqs,
                               freq_mult=freq_mult, method=method,
                               rows_pad=rows_pad, lane_ok=lane_ok)
        w0 = refs[0][...]
        h = _kdot(
            h0t, w0, (((0,), (0,)), ((), ())),
        ).astype(w0.dtype) + refs[1][...]
        if not (final_linear and n_layers == 1):
            h = _act(h)
        for i in range(1, n_layers):
            h = _layer(h, refs[2 * i], refs[2 * i + 1])
            if not (final_linear and i == n_layers - 1):
                h = _act(h)
        if reduce_k:
            h = _wsum_reduce(
                h, _w_col(p_ref[0][3:4, sl], lane_ok, sub), reduce_k)
            o_ref[0, t * (sub // reduce_k):(t + 1) * (sub // reduce_k)] = (
                h.astype(o_ref.dtype))
        else:
            o_ref[0, sl] = h.astype(o_ref.dtype)


def _bwd_posenc_kernel(f_ref, p_ref, *refs, n_layers: int, final_linear: bool,
                       pos_dim: int, n_freqs: int, freq_mult: float,
                       method: str, rows_pad: int, rows: int, f_dim: int,
                       reduce_k: int, need_dw: bool, need_dp: bool):
    n_in = 2 * n_layers + 1
    g_ref = refs[n_in - 1]
    df_ref = refs[n_in]
    off = n_in + 1
    dp_ref = None
    if need_dp:
        dp_ref = refs[off]
        off += 1
    dw_refs = refs[off: off + 2 * n_layers]
    acc_refs = refs[off + 2 * n_layers:]

    b_i = pl.program_id(0)
    blk_j = pl.program_id(1)

    @pl.when((b_i == 0) & (blk_j == 0))
    def _zero():
        for a in acc_refs:
            a[...] = jnp.zeros_like(a)

    blk = f_ref.shape[-1]
    lane = blk_j * blk + jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1)
    lane_ok = lane < rows

    h0t, sins, coss = _build_h0t(
        f_ref[0], p_ref[0][:pos_dim], pos_dim=pos_dim, n_freqs=n_freqs,
        freq_mult=freq_mult, method=method, rows_pad=rows_pad,
        lane_ok=lane_ok)

    # forward recompute (layer 1 transposed, rest row-major). Only the
    # pre-activations zs are kept live; layer inputs act(z) are re-derived
    # in the backward walk (a VPU max — cheaper than holding n-1 extra
    # [blk, 256] residuals in VMEM, which pinned the block size)
    w0 = refs[0][...]
    z = _kdot(
        h0t, w0, (((0,), (0,)), ((), ())),
    ).astype(w0.dtype) + refs[1][...]
    zs = [z]
    h = z if (final_linear and n_layers == 1) else _act(z)
    for l in range(1, n_layers):
        z = _layer(h, refs[2 * l], refs[2 * l + 1])
        zs.append(z)
        h = z if (final_linear and l == n_layers - 1) else _act(z)

    dw_row = None
    if reduce_k:
        # expand the per-point cotangent back to pairs (sublane-group
        # broadcast) and weight it: g_pairs[r] = w[r] * g_out[r // k]
        npts = blk // reduce_k
        d_out = g_ref.shape[-1]
        pt_ok = (blk_j * npts + jax.lax.broadcasted_iota(
            jnp.int32, (npts, 1), 0)) < (rows // reduce_k)
        g_out = jnp.where(pt_ok, g_ref[0].astype(jnp.float32), 0.0)
        g_exp = jnp.broadcast_to(
            g_out[:, None, :], (npts, reduce_k, d_out)).reshape(blk, d_out)
        w_col = _w_col(p_ref[0][3:4], lane_ok, blk)
        g = g_exp * w_col  # [blk, d_out]
        if need_dw:
            # dw[r] = <h_last[r], g_out[r // k]>: lane reduce, then back to
            # the [1, blk] row layout of dpos
            h_last = zs[-1] if final_linear else _act(zs[-1])
            dw_col = jnp.sum(h_last.astype(jnp.float32) * g_exp, axis=1,
                             keepdims=True)  # [blk, 1]
            dw_row = dw_col.reshape(1, blk)
        else:
            # w is a pure geometry function in the production model (kp_pos
            # detached, shading points camera/depth-derived, coords frozen
            # — reference pointnerf.py:22-24), so its cotangent is dead;
            # skipping the reduce+relayout saves a measured 3.6 ms/step
            dw_row = jnp.zeros((1, blk), jnp.float32)
    else:
        row = jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0)
        row_ok = (blk_j * blk + row) < rows
        g = jnp.where(row_ok, g_ref[0].astype(jnp.float32), 0.0)

    cd = w0.dtype
    lowp = _BF16_BWD and cd == jnp.bfloat16
    # With the weighted reduction folded in and a linear final layer, the
    # last layer's per-pair cotangent is rank-1 per point (w_j * g_out[n]),
    # so dW_last = (sum_j w_j h_last[n,j])^T g_out contracts over POINTS
    # instead of pairs — k x fewer dW MACs for that layer (the wsum reduce
    # is the same VPU pattern as the forward's output reduction). Exactly
    # equal to the per-pair formulation in exact arithmetic.
    fast_last = bool(reduce_k) and final_linear and n_layers > 1
    for l in range(n_layers - 1, 0, -1):
        if not (final_linear and l == n_layers - 1):
            g = g * _act_grad(zs[l].astype(jnp.float32))
        gd = g.astype(cd) if lowp else g
        # layer l's input is act(zs[l-1]) — always activated, since l-1
        # can't be the final_linear layer inside this loop
        if fast_last and l == n_layers - 1:
            hw = _wsum_reduce(_act(zs[l - 1]), w_col, reduce_k)  # [npts, d] f32
            acc_refs[2 * l][...] += _kdot(
                hw.astype(cd) if lowp else hw,
                g_out.astype(cd) if lowp else g_out,
                (((0,), (0,)), ((), ())),
            )
            acc_refs[2 * l + 1][...] += jnp.sum(g, axis=0, keepdims=True)
        else:
            acc_refs[2 * l][...] += _kdot(
                _act(zs[l - 1]).astype(cd if lowp else jnp.float32), gd,
                (((0,), (0,)), ((), ())),
            )
            acc_refs[2 * l + 1][...] += jnp.sum(g, axis=0, keepdims=True)
        w = refs[2 * l][...]
        g = _kdot(
            gd, w if lowp else w.astype(jnp.float32),
            (((1,), (1,)), ((), ())),
        )

    # layer 1 (transposed boundary)
    if not (final_linear and n_layers == 1):
        g = g * _act_grad(zs[0].astype(jnp.float32))
    gd = g.astype(cd) if lowp else g
    acc_refs[0][...] += _kdot(
        h0t.astype(cd if lowp else jnp.float32), gd,
        (((1,), (0,)), ((), ())),
    )  # [D1K, d_out]
    acc_refs[1][...] += jnp.sum(g, axis=0, keepdims=True)
    # dp dead (need_dp=False): only the feat rows of dh0t are needed, so
    # slice W1's rows before the dot and skip the posenc derivative chain
    # and the dpos output entirely
    w0d = w0 if need_dp else w0[:f_dim]
    dh0t = _kdot(
        w0d if lowp else w0d.astype(jnp.float32), gd,
        (((1,), (1,)), ((), ())),
    )  # [D1K or f_dim, blk]

    df_ref[0] = dh0t[:f_dim].astype(df_ref.dtype)
    if need_dp:
        base = f_dim + pos_dim
        dx = dh0t[f_dim:base]
        for j in range(n_freqs):
            kj = freq_mult * math.pi * float(2 ** j)
            dsin = dh0t[base + j * pos_dim: base + (j + 1) * pos_dim]
            dcos = dh0t[base + (n_freqs + j) * pos_dim:
                        base + (n_freqs + j + 1) * pos_dim]
            dx = dx + kj * (dsin * coss[j] - dcos * sins[j])
        pieces = [dx]
        if dw_row is not None:  # w rides pos row 3, dw rides dpos row 3
            pieces.append(dw_row)
        pad_rows = dp_ref.shape[1] - sum(p.shape[0] for p in pieces)
        pieces.append(jnp.zeros((pad_rows, dx.shape[1]), jnp.float32))
        dp_ref[0] = jnp.concatenate(pieces, axis=0)

    @pl.when((b_i == pl.num_programs(0) - 1) & (blk_j == pl.num_programs(1) - 1))
    def _store():
        for dw_ref, acc_ref in zip(dw_refs, acc_refs):
            dw_ref[...] = acc_ref[...]


def _posenc_perm(f_dim: int, pos_dim: int, n_freqs: int):
    """Row permutation taking the reference dim-major W1 row order to the
    kernel's octave-major order: w0_kernel = w0[perm]."""
    perm = list(range(f_dim + pos_dim))
    base = f_dim + pos_dim
    for blkoff in (0, n_freqs):  # sins then coss
        for j in range(n_freqs):
            for d in range(pos_dim):
                perm.append(base + d * 2 * n_freqs + blkoff + j)
    return np.asarray(perm)


def _prep_posenc_w0(w0, f_dim, pos_dim, n_freqs):
    d1 = f_dim + pos_dim * (1 + 2 * n_freqs)
    assert w0.shape[0] == d1, (w0.shape, d1)
    d1k = _round_up8(d1, 16 if w0.dtype == jnp.bfloat16 else 8)
    w0k = w0[_posenc_perm(f_dim, pos_dim, n_freqs)]
    return jnp.pad(w0k, ((0, d1k - d1), (0, 0))), d1k - d1


def _round_up8(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _wsum_grid(b, m, k, cap=_BLK):
    """Grid/block for the reduced variant: the pair block must hold whole
    points (k | blk) and the reduced output block must stay sublane-aligned
    (8k | blk)."""
    unit = 8 * k
    blk = (min(cap, m) // unit) * unit
    if blk == 0:
        return None, 0
    return (b, pl.cdiv(m, blk)), blk


def wsum_supported(m: int, k: int) -> bool:
    """Whether fused_mlp_posenc_wsum can run at M=m pairs, k neighbors."""
    return k > 0 and m % k == 0 and min(_BLK, m) >= 8 * k


def _posenc_cap(dtype, cap: int) -> int:
    """Pair-block cap, adjusted for compute dtype: the defaults are tuned
    for bf16 production compute; f32 doubles every VMEM-resident
    activation, and the bf16-tuned fwd cap oversubscribes scoped VMEM at
    some shapes (measured: blk 4096 f32 needs 16.36M vs the 16M limit at
    the tiny-geometry train step). Halve for >=4-byte compute; halve
    again when the ambient matmul precision requests multi-pass f32 dots
    (the parity-exact eval path, render_config.matmul_precision) — the
    extra dot scratch pushed blk 3584 f32 to 17.21M scoped."""
    import numpy as _np

    if _np.dtype(dtype).itemsize >= 4:
        cap = max(512, cap // 2)
        prec = str(getattr(jax.config, "jax_default_matmul_precision", None))
        if prec in ("float32", "highest", "tensorfloat32", "high"):
            cap = max(512, cap // 2)
    return cap


def _posenc_impl_fwd(feat_t, pos_t, weights, n_freqs, freq_mult,
                     final_linear, method, reduce_k=0):
    b, f_dim, m = feat_t.shape
    pos_dim = 3
    n_layers = len(weights)
    d_out = weights[-1][0].shape[1]
    w0k, rows_pad = _prep_posenc_w0(weights[0][0], f_dim, pos_dim, n_freqs)
    kweights = ((w0k, weights[0][1]),) + tuple(weights[1:])
    cap_fwd = _posenc_cap(feat_t.dtype, _BLK_FWD)
    if reduce_k:
        grid, blk = _wsum_grid(b, m, reduce_k, cap=cap_fwd)
        out_shape = jax.ShapeDtypeStruct((b, m // reduce_k, d_out),
                                         feat_t.dtype)
        out_spec = pl.BlockSpec((1, blk // reduce_k, d_out),
                                lambda i, j: (i, j, 0),
                                memory_space=pltpu.VMEM)
    else:
        grid, blk = _grid_and_blk(b, m, cap=cap_fwd)
        out_shape = jax.ShapeDtypeStruct((b, m, d_out), feat_t.dtype)
        out_spec = pl.BlockSpec((1, blk, d_out), lambda i, j: (i, j, 0),
                                memory_space=pltpu.VMEM)
    col = lambda d: pl.BlockSpec((1, d, blk), lambda i, j: (i, 0, j),
                                 memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_posenc_kernel, n_layers=n_layers,
                          final_linear=final_linear, pos_dim=pos_dim,
                          n_freqs=n_freqs, freq_mult=freq_mult,
                          method=method, rows_pad=rows_pad,
                          reduce_k=reduce_k, rows=m),
        out_shape=out_shape,
        grid=grid,
        in_specs=[col(f_dim), col(pos_t.shape[1])] + _w_specs(kweights),
        out_specs=out_spec,
    )(feat_t, pos_t, *_flat_weights(kweights))


def _posenc_impl_bwd(feat_t, pos_t, weights, g, n_freqs, freq_mult,
                     final_linear, method, reduce_k=0, need_dw=True,
                     need_dp=True):
    if need_dw and not need_dp:
        raise ValueError("need_dw requires need_dp (dw rides dpos row 3)")
    b, f_dim, m = feat_t.shape
    pos_dim = 3
    n_layers = len(weights)
    w0k, rows_pad = _prep_posenc_w0(weights[0][0], f_dim, pos_dim, n_freqs)
    kweights = ((w0k, weights[0][1]),) + tuple(weights[1:])
    cap_bwd = _posenc_cap(feat_t.dtype, _BLK_BWD)
    if reduce_k:
        grid, blk = _wsum_grid(b, m, reduce_k, cap=cap_bwd)
        g_spec = pl.BlockSpec((1, blk // reduce_k, g.shape[-1]),
                              lambda i, j: (i, j, 0),
                              memory_space=pltpu.VMEM)
    else:
        grid, blk = _grid_and_blk(b, m, cap=cap_bwd)
        g_spec = pl.BlockSpec((1, blk, g.shape[-1]), lambda i, j: (i, j, 0),
                              memory_space=pltpu.VMEM)
    col = lambda d: pl.BlockSpec((1, d, blk), lambda i, j: (i, 0, j),
                                 memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i, j: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    w_shapes = []
    for w, bias in kweights:
        w_shapes += [w.shape, (1, bias.shape[-1])]

    out_shapes = [jax.ShapeDtypeStruct(feat_t.shape, feat_t.dtype)]
    out_specs = [col(f_dim)]
    if need_dp:
        out_shapes.append(jax.ShapeDtypeStruct(pos_t.shape, jnp.float32))
        out_specs.append(col(pos_t.shape[1]))
    for s in w_shapes:
        out_shapes.append(jax.ShapeDtypeStruct(s, jnp.float32))
        out_specs.append(full(s))
    scratch = [pltpu.VMEM(s, jnp.float32) for s in w_shapes]

    outs = pl.pallas_call(
        functools.partial(_bwd_posenc_kernel, n_layers=n_layers,
                          final_linear=final_linear, pos_dim=pos_dim,
                          n_freqs=n_freqs, freq_mult=freq_mult,
                          method=method, rows_pad=rows_pad, rows=m,
                          f_dim=f_dim, reduce_k=reduce_k, need_dw=need_dw,
                          need_dp=need_dp),
        out_shape=tuple(out_shapes),
        grid=grid,
        in_specs=[col(f_dim), col(pos_t.shape[1])] + _w_specs(kweights)
        + [g_spec],
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
    )(feat_t, pos_t, *_flat_weights(kweights), g)
    dfeat_t = outs[0]
    woff = 1
    if need_dp:
        dpos_t = outs[1]
        woff = 2
    else:
        # structurally-zero cotangent (the caller stop_gradients x_rel/w);
        # a broadcast-zeros here is fused away by XLA wherever it lands
        dpos_t = jnp.zeros(pos_t.shape, jnp.float32)
    dws = []
    inv = np.argsort(_posenc_perm(f_dim, pos_dim, n_freqs))
    d1 = f_dim + pos_dim * (1 + 2 * n_freqs)
    for l in range(n_layers):
        w, bias = weights[l]
        dw = outs[woff + 2 * l]
        if l == 0:
            dw = dw[:d1][inv]
        dws.append((dw.astype(w.dtype),
                    outs[woff + 1 + 2 * l].reshape(bias.shape)
                    .astype(bias.dtype)))
    return dfeat_t, dpos_t, tuple(dws)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_mlp_posenc(
    feat_t: jnp.ndarray,
    pos_t: jnp.ndarray,
    weights: Tuple[Tuple[jnp.ndarray, jnp.ndarray], ...],
    n_freqs: int,
    freq_mult: float = 1.0,
    final_linear: bool = True,
    method: str = "direct",
) -> jnp.ndarray:
    """Aggregation MLP with in-kernel positional encoding.

    feat_t [B, F, M] (compute dtype), pos_t [B, >=3 rows, M] f32 (x_rel on
    rows 0..2) -> [B, M, d_out]. Layer-1 semantics are identical to
    apply_mlp(concat([feat, x, posenc(x)], -1)) with the recurrence posenc
    (nn_core.positional_encoding); weights[0][0] uses that reference
    dim-major row order."""
    return _posenc_impl_fwd(feat_t, pos_t, weights, n_freqs, freq_mult,
                            final_linear, method)


def _posenc_vjp_fwd(feat_t, pos_t, weights, n_freqs, freq_mult, final_linear,
                    method):
    out = _posenc_impl_fwd(feat_t, pos_t, weights, n_freqs, freq_mult,
                           final_linear, method)
    return out, (feat_t, pos_t, weights)


def _posenc_vjp_bwd(n_freqs, freq_mult, final_linear, method, res, g):
    feat_t, pos_t, weights = res
    return _posenc_impl_bwd(feat_t, pos_t, weights, g, n_freqs, freq_mult,
                            final_linear, method)


fused_mlp_posenc.defvjp(_posenc_vjp_fwd, _posenc_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def fused_mlp_posenc_wsum(
    feat_t: jnp.ndarray,
    pos_t: jnp.ndarray,
    weights: Tuple[Tuple[jnp.ndarray, jnp.ndarray], ...],
    k: int,
    n_freqs: int,
    freq_mult: float = 1.0,
    final_linear: bool = True,
    method: str = "direct",
    need_dw: bool = True,
    need_dp: bool = True,
) -> jnp.ndarray:
    """fused_mlp_posenc with the k-neighbor weighted reduction folded into
    the kernel's output: returns [B, M // k, d_out] where row n is
    sum_j w[n*k+j] * mlp(pair n*k+j), i.e. the
    einsum('bnk,bnkc->bnc', w, local_feat) the aggregator otherwise runs
    outside (reference aggregators/mlp.py:102-125's index_add_ scatter).
    Folding it divides the kernel's output (and the backward's cotangent)
    HBM traffic by k and removes the [B, M, d_out] pair tensor entirely.

    The per-pair weight w rides pos_t ROW 3 (f32, the otherwise zero-padded
    sublane); its gradient returns in dpos_t row 3. Pairs of one shading
    point must be contiguous (pair r belongs to point r // k). Requires
    wsum_supported(M, k)."""
    return _posenc_impl_fwd(feat_t, pos_t, weights, n_freqs, freq_mult,
                            final_linear, method, reduce_k=k)


def _posenc_wsum_vjp_fwd(feat_t, pos_t, weights, k, n_freqs, freq_mult,
                         final_linear, method, need_dw, need_dp):
    out = _posenc_impl_fwd(feat_t, pos_t, weights, n_freqs, freq_mult,
                           final_linear, method, reduce_k=k)
    return out, (feat_t, pos_t, weights)


def _posenc_wsum_vjp_bwd(k, n_freqs, freq_mult, final_linear, method,
                         need_dw, need_dp, res, g):
    feat_t, pos_t, weights = res
    return _posenc_impl_bwd(feat_t, pos_t, weights, g, n_freqs, freq_mult,
                            final_linear, method, reduce_k=k,
                            need_dw=need_dw, need_dp=need_dp)


fused_mlp_posenc_wsum.defvjp(_posenc_wsum_vjp_fwd, _posenc_wsum_vjp_bwd)
