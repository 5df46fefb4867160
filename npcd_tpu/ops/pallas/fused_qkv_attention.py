"""Zero-copy fused-qkv flash attention for the NPCD denoiser.

The denoiser's attention projects to one fused qkv tensor
(reference npcd/models/diffusion/denoisers/transformer.py:71-75). The
first-generation kernel took separate q/k/v in [B, S, H, D] and re-laid them
out to [B*H, S_pad, D] in HBM — profiling the 302M train step on v5e showed
those pads/transposes/splits cost ~60 ms/step while the attention math
itself was ~20 ms.

This kernel reads the fused tensor directly with NO HBM-level transpose,
pad, or split, and operates natively on the denoiser's 2D token layout
[B*S, 3W] (S sublane-aligned): each grid program's row block is one
sequence, selected by the BlockSpec index map. Keeping the custom call 2D
matters beyond the kernel itself — when the kernel demanded [B, S, W]
operands, XLA folded the boundary reshapes into the neighbouring projection
dX matmuls and emitted them as batch-in-sublanes convolutions at ~57% MXU
utilization (the plain 2D dots run at ~98%).

To make the blocks tileable the qkv projection uses a *grouped* [Q | K | V]
channel order instead of the reference's per-head [q|k|v] groups — a pure
relabeling of the projection's output channels; the torch->jax weight
converter applies the corresponding one-time column permutation
(npcd_tpu/utils/convert_reference.py). The layout has ``groups`` head
groups; group g (heads [g*H/G, (g+1)*H/G)) owns the contiguous column range
[g*3*Wg, (g+1)*3*Wg) (Wg = W/G), internally ordered [Q_g | K_g | V_g] with
heads contiguous inside each third. ``groups=1`` is the global [Q|K|V]
order. The grouping exists for tensor parallelism: a TP split of the
projection's output columns into ``tp`` parts (tp dividing G) lands on
whole head groups, so every shard owns complete (q, k, v) triples for its
heads and attention needs no cross-shard communication
(npcd_tpu/parallel/tp.py). The flagship config (16 heads, D=64) defaults to
G=2 — identical kernel blocks/grid to the global layout, just a different
column index map.

  * the same qkv array is passed three times with different index_maps, so
    each grid program sees its Q/K/V column group as an ordinary tiled
    [S, hpb*D] VMEM block
  * per head: softmax(QK^T / sqrt(D)) V with bf16 MXU inputs and f32
    accumulation/statistics; keys >= valid_len (sequence padding) are
    masked out of the softmax
  * the forward also emits per-head log-sum-exp (base-2, see _LOG2_E) so
    the backward rebuilds p = exp2(logits2 - lse2) with no row
    max/sum/divide; no [B, H, S, S] tensor ever exists in HBM in either
    direction

VMEM per program at the SRN-Cars config (S=520, D=64, 8 heads/block):
q/k/v(/g) blocks [520, 512] bf16 ~= 0.53 MB each, logits + dP f32 ~= 2.2 MB.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# The kernels work in base-2 exponential space: log2(e) is folded into the
# softmax scale, which is itself pre-applied to the [S, D] q block (S/D
# ~8x cheaper than a multiply pass over the [S, S] logits), and exp2
# replaces exp. On TPU exp(x) lowers to exp2(x * log2e) with an extra
# [S, S] VPU multiply pass per call site; exp2 skips it in both the
# forward and the backward's softmax recompute. The lse residual is stored
# in base-2 units (m2 + log2(l)); it never leaves the fwd->bwd pair.
_LOG2_E = 1.4426950408889634

# Every dot in this kernel family pins DEFAULT precision explicitly: the
# kernel's contract is bf16-operand MXU multiplies with f32 accumulation
# (qualified numerics, header note above), and an AMBIENT multi-pass
# precision (jax.default_matmul_precision('highest'), the r05 parity
# render setting) would both change the qualified semantics and blow the
# kernel's scoped-VMEM plan (measured: f32 sampler under ambient highest
# fails to compile at 20.18M vs the 16M limit). Exact-precision attention
# is not a parity requirement — the sampler chain is contractive and its
# full-bf16 variant is qualified end-to-end (docs/PARITY.md GELU note).
_DOT_PREC = jax.lax.Precision.DEFAULT

import os as _os

# exact-parity escape hatch for the bf16 sum-dot softmax normalizer (see
# _fwd_kernel): read once at import so the flag is jit-trace stable
_NO_SUMDOT = _os.environ.get("NPCD_ATTN_NO_SUMDOT", "") not in ("", "0")


def _heads_per_block(heads: int, d: int, groups: int = 1) -> int:
    """Largest per-program head count whose column width is lane-aligned.

    Operates within one layout group of heads//groups heads: the block must
    evenly tile the group's per-third column range."""
    hg = heads // groups
    for hpb in (8, 4, 2):
        if hg % hpb == 0 and (hpb * d) % 128 == 0:
            return hpb
    return hg


def _mask_bias(s, valid_len):
    """[1, S] additive key-padding mask (0 real / -1e30 pad), or None.

    Computed ONCE per grid program and broadcast-added into the logits
    scale pass — a per-head [S, S] iota+compare+select costs three VPU
    elemops per logit where the add costs one."""
    if valid_len is None or valid_len >= s:
        return None
    key_idx = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
    return jnp.where(key_idx < valid_len, 0.0, -1e30).astype(jnp.float32)


def _logits(q_scaled, k, mask_bias):
    # q/k stay in their storage dtype (bf16 in the denoiser): the MXU
    # multiplies bf16 at full rate with f32 accumulation; converting the
    # blocks to f32 first (the first-generation kernel) forced the ~4x
    # slower f32 MXU path and capped the whole attention family at
    # ~54 TFLOPS on v5e. Softmax statistics remain f32.
    #
    # The softmax scale (with log2(e) folded in, module docstring) is
    # pre-applied to q by the caller as an [S, D] pass — S/D (~8x) cheaper
    # than scaling the [S, S] logits, and the same fold the reference's
    # fp16 einsum path uses (transformer.py:68-84 pre-scales q/k).
    logits = jax.lax.dot_general(
        q_scaled, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_DOT_PREC,
    )  # [S, S] f32, base-2 logits
    if mask_bias is not None:
        # keys beyond valid_len are padding tokens (the caller pads S up to
        # a sublane multiple so HBM reshapes around the kernel are bitcasts)
        logits = logits + mask_bias
    return logits


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, d: int, hpb: int,
                sm_scale: float, valid_len):
    xq = q_ref[...]  # [S, hpb*D], storage dtype
    xk = k_ref[...]
    xv = v_ref[...]
    s = xq.shape[0]
    mask_bias = _mask_bias(s, valid_len)
    c2 = jnp.asarray(sm_scale * _LOG2_E, xq.dtype)

    # Two scheduling changes over the naive per-head loop, A/B'd on v5e at
    # the flagship geometry (tools/attn_ab.py: 615 -> 503 us/call, -18%):
    #
    # 1. Row-sum in the PV dot. The PV dot's output width D < 128 leaves
    #    MXU lanes idle, so widening V to a 128-column group
    #    [v_h | ones | zeros] is wall-clock free and its 'ones' column
    #    emits l = sum(e) — the separate [S, S] VPU reduce pass disappears
    #    (e is also cast bf16 inside the exp2 chain, one pass total).
    #    l then sums bf16-rounded e terms with f32 accumulation: outputs
    #    move by <= 1 bf16 ulp vs the f32 row-sum, and the lse residual is
    #    computed from the same l, so the backward's rebuilt p stays
    #    consistent with the forward normalization. Only taken when D pads
    #    to 128 for free (aug_cols == one extra lane group); D % 128 == 0
    #    keeps the plain f32 row-sum.
    # 2. Head software-pipelining: head h+1's QK^T is issued before head
    #    h's softmax/PV so Mosaic can overlap the MXU dot with the VPU
    #    softmax passes (heads are independent).
    # NPCD_ATTN_NO_SUMDOT=1 disables the bf16 sum-dot normalizer (exact
    # f32 row-sum instead) for parity-debugging/regression runs; the
    # default deviation is bounded at <= 1 bf16 ulp (see note above) and
    # measured faster, so production keeps it on.
    use_sumdot = d % 128 != 0 and not _NO_SUMDOT  # ones column rides the lane pad
    aug_cols = d + ((-d) % 128)  # = round_up(d, 128) when use_sumdot
    if use_sumdot:
        ones = jnp.ones((s, 1), xv.dtype)
        zeros = jnp.zeros((s, aug_cols - d - 1), xv.dtype)
        vaug = jnp.concatenate(
            [jnp.concatenate([xv[:, h * d:(h + 1) * d], ones, zeros], axis=1)
             for h in range(hpb)], axis=1)

    def logits_h(h):
        sl = slice(h * d, (h + 1) * d)
        return _logits(xq[:, sl] * c2, xk[:, sl], mask_bias)

    lg = logits_h(0)
    for h in range(hpb):
        sl = slice(h * d, (h + 1) * d)
        logits = lg
        lg = logits_h(h + 1) if h + 1 < hpb else None
        m = jnp.max(logits, axis=-1, keepdims=True)
        if use_sumdot:
            e = jnp.exp2(logits - m).astype(xv.dtype)
            ol = jnp.dot(e, vaug[:, h * aug_cols:(h + 1) * aug_cols],
                         precision=_DOT_PREC,
                         preferred_element_type=jnp.float32)  # [S, aug]
            l = ol[:, d:d + 1]
            o = ol[:, :d]
        else:
            e = jnp.exp2(logits - m)
            l = jnp.sum(e, axis=-1, keepdims=True)
            # normalize the small [S, D] output instead of the [S, S]
            # weight matrix (saves a full S x S elementwise pass), casting
            # e to the IO dtype for the PV matmul — same precision
            # semantics as the einsum fallback's weights.astype(q.dtype);
            # accumulation stays f32
            o = jnp.dot(e.astype(xv.dtype), xv[:, sl], precision=_DOT_PREC,
                        preferred_element_type=jnp.float32)
        o_ref[:, sl] = (o / l).astype(o_ref.dtype)
        # base-2 log-sum-exp residual ([S, 1] per head, heads on lanes) lets
        # the backward rebuild p = exp2(logits2 - lse2), no max/sum/divide
        lse_ref[0, 0, :, h : h + 1] = m + jnp.log2(l)


def _bwd_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref,
                dq_ref, dk_ref, dv_ref,
                *, d: int, hpb: int, sm_scale: float, valid_len):
    # all matmul operands in storage dtype (f32 accumulate) — see _logits.
    # The fwd lse residual makes the softmax recompute reduction-free: p is
    # rebuilt as exp(logits - lse) (no row max/sum/divide). The output o is
    # deliberately NOT saved as a residual: at batch 32 the extra 34 MB/layer
    # pushed total HBM past capacity and XLA started rematerializing forward
    # MLP matmuls (~1.4 ms each) — costlier than the [S, S] rowsum for
    # delta = rowsum(p * dp) this recomputes.
    xq = q_ref[...]
    xk = k_ref[...]
    xv = v_ref[...]
    xg = g_ref[...]
    io = xq.dtype
    mask_bias = _mask_bias(xq.shape[0], valid_len)
    c2 = jnp.asarray(sm_scale * _LOG2_E, io)
    for h in range(hpb):
        sl = slice(h * d, (h + 1) * d)
        q, k, v, g = xq[:, sl], xk[:, sl], xv[:, sl], xg[:, sl]
        lse = lse_ref[0, 0, :, h : h + 1]  # [S, 1] f32, base-2 units
        logits = _logits(q * c2, k, mask_bias)
        p = jnp.exp2(logits - lse)  # normalized, pad keys -> exp2(-inf) = 0
        pc = p.astype(io)
        dv = jax.lax.dot_general(
            pc, g, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_DOT_PREC,
        )
        dp = jax.lax.dot_general(
            g, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_DOT_PREC,
        )
        delta = jnp.sum(p * dp, axis=-1, keepdims=True)
        # sm_scale is applied to the [S, D] f32 matmul outputs below, not to
        # the [S, S] ds — one fewer full-logits VPU pass, and the f32
        # post-scale rounds once less than scaling ds before the io cast
        ds = (p * (dp - delta)).astype(io)
        dq = jnp.dot(ds, k, preferred_element_type=jnp.float32,
                     precision=_DOT_PREC) * sm_scale
        dk = jax.lax.dot_general(
            ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_DOT_PREC,
        ) * sm_scale
        dq_ref[:, sl] = dq.astype(dq_ref.dtype)
        dk_ref[:, sl] = dk.astype(dk_ref.dtype)
        dv_ref[:, sl] = dv.astype(dv_ref.dtype)


def _specs(s, hpb_cols, m):
    """Index maps selecting Q/K/V column blocks of the fused [B*S, 3W] array
    in the grouped layout (see module docstring).

    Row block i is sequence i (rows [i*s, (i+1)*s)). Grid program j maps to
    layout group g = j // m, sub-block u = j % m (m = column blocks per
    third per group); group g's region starts at block g*3*m, third `third`
    within it at +third*m. With one group this is the global [Q|K|V] map
    third*m + j."""
    def at(third):
        def imap(i, j, third=third):
            g = j // m
            u = j % m
            return (i, g * 3 * m + third * m + u)
        return pl.BlockSpec((s, hpb_cols), imap, memory_space=pltpu.VMEM)
    return at


def _fwd_impl(qkv, heads, b, s, valid_len, groups=1):
    w = qkv.shape[-1] // 3
    d = w // heads
    hpb = _heads_per_block(heads, d, groups)
    cols = hpb * d
    n_prog = heads // hpb  # grid programs per sequence (all groups)
    at = _specs(s, cols, n_prog // groups)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, d=d, hpb=hpb,
                          sm_scale=1.0 / (d ** 0.5), valid_len=valid_len),
        out_shape=(
            jax.ShapeDtypeStruct((b * s, w), qkv.dtype),
            jax.ShapeDtypeStruct((b, n_prog, s, hpb), jnp.float32),
        ),
        grid=(b, n_prog),
        in_specs=[at(0), at(1), at(2)],
        out_specs=(
            pl.BlockSpec((s, cols), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, hpb), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )(qkv, qkv, qkv)
    return out, lse


def _bwd_impl(qkv, lse, g, heads, b, s, valid_len, groups=1):
    w = qkv.shape[-1] // 3
    d = w // heads
    hpb = _heads_per_block(heads, d, groups)
    cols = hpb * d
    at = _specs(s, cols, heads // hpb // groups)
    grad_spec = pl.BlockSpec((s, cols), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((1, 1, s, hpb), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((b * s, w), qkv.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, d=d, hpb=hpb,
                          sm_scale=1.0 / (d ** 0.5), valid_len=valid_len),
        out_shape=(shape, shape, shape),
        grid=(b, heads // hpb),
        in_specs=[at(0), at(1), at(2), grad_spec, lse_spec],
        out_specs=(grad_spec, grad_spec, grad_spec),
    )(qkv, qkv, qkv, g, lse)
    if groups == 1:
        return jnp.concatenate([dq, dk, dv], axis=-1)
    # dq/dk/dv come out head-major; interleave them back into the grouped
    # [Q_g|K_g|V_g] column order of the input. Expressed as a concatenate of
    # contiguous slices (NOT a stack+reshape): XLA folds slice+concat into
    # the consumer matmuls exactly like the groups=1 concatenate, so no
    # extra HBM pass materializes (stack's interleaved layout cost a
    # measured ~0.28 ms/call on v5e).
    wg = w // groups
    parts = []
    for grp in range(groups):
        sl = slice(grp * wg, (grp + 1) * wg)
        parts += [dq[:, sl], dk[:, sl], dv[:, sl]]
    return jnp.concatenate(parts, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def fused_qkv_attention_2d(
    qkv: jnp.ndarray, heads: int, b: int, s: int, valid_len=None, groups: int = 1
) -> jnp.ndarray:
    """Attention over fused qkv [B*S, 3W] 2D tokens in the grouped [Q|K|V]
    channel layout (see module docstring; groups=1 is the global order)
    -> [B*S, W] with heads in plain head-major column order. Non-causal,
    softmax scale 1/sqrt(D). Rows are batch-major (row = b*s + i). Keys at
    positions >= valid_len (if given) are masked out of the softmax —
    callers pad S to a sublane multiple so everything around the kernel
    stays 2D; pad-query outputs are garbage the caller discards."""
    out, _ = _fwd_impl(qkv, heads, b, s, valid_len, groups)
    return out


def _vjp_fwd(qkv, heads, b, s, valid_len, groups):
    out, lse = _fwd_impl(qkv, heads, b, s, valid_len, groups)
    return out, (qkv, lse)


def _vjp_bwd(heads, b, s, valid_len, groups, res, g):
    qkv, lse = res
    return (_bwd_impl(qkv, lse, g, heads, b, s, valid_len, groups),)


fused_qkv_attention_2d.defvjp(_vjp_fwd, _vjp_bwd)


def fused_qkv_attention(
    qkv: jnp.ndarray, heads: int, valid_len=None, groups: int = 1
) -> jnp.ndarray:
    """3D wrapper: [B, S, 3W] -> [B, S, W] (see fused_qkv_attention_2d)."""
    b, s, w3 = qkv.shape
    out = fused_qkv_attention_2d(qkv.reshape(b * s, w3), heads, b, s, valid_len, groups)
    return out.reshape(b, s, w3 // 3)
