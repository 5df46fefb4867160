"""A/B attention-kernel scheduling variants on the real TPU.

The r03 trace shows attention fwd at 0.60 ms/layer (MXU floor 0.36 +
VPU softmax ~0.24 — fully serialized) and bwd at 1.28 (0.90 + 0.38).
Variants measured here against the production kernel at the flagship
geometry (B=32, S=520, H=16, D=64, groups=2, bf16):

  fwd A: production `fused_qkv_attention_2d`
  fwd B: row-sum folded into the PV dot — per head the dot widens from
         [520x520]@[520x64] to @[520x128] with V augmented as
         [v_h | ones | 0...]; width 64->128 is free on the MXU (64-wide
         dots run at 50% lane utilization), so l = sum(e) stops being a
         separate VPU reduce pass. e is cast bf16 once (exp2 chain), so
         l sums bf16-rounded terms with f32 accumulation.
  fwd C: software-pipelined heads — head h+1's QK^T is issued before
         head h's softmax/PV, giving the scheduler an MXU op to overlap
         with the VPU passes.
  fwd D: B + C.
  bwd A: production backward.
  bwd B: software-pipelined logits recompute (head h+1 before head h's
         VPU chain).

Run from the repo root: python tools/attn_ab.py
"""
import functools
import os.path as osp
import sys

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, osp.join(REPO, "tools"))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tputime import device_time
from npcd_tpu.ops.pallas import fused_qkv_attention as prod

_LOG2_E = prod._LOG2_E

B, S, H, D, G = 32, 520, 16, 64, 2
W = H * D
HPB = prod._heads_per_block(H, D, G)
import os
if os.environ.get("ATTN_AB_HPB"):
    HPB = int(os.environ["ATTN_AB_HPB"])


# ---------------------------------------------------------------- fwd B/D

def _fwd_kernel_sumdot(q_ref, k_ref, v_ref, o_ref, lse_ref, *, d, hpb,
                       sm_scale, valid_len, pipelined: bool):
    xq = q_ref[...]
    xk = k_ref[...]
    xv = v_ref[...]
    s = xq.shape[0]
    mask_bias = prod._mask_bias(s, valid_len)
    c2 = jnp.asarray(sm_scale * _LOG2_E, xq.dtype)
    # augmented V: per head 128 columns [v_h | ones | zeros]; built once
    # per program with [S, hpb*D] traffic (~4x cheaper than one [S, S]
    # pass) so the PV dot emits l in its 65th column
    ones = jnp.ones((s, 1), xv.dtype)
    zeros = jnp.zeros((s, 128 - d - 1), xv.dtype)
    vaug = jnp.concatenate(
        [jnp.concatenate([xv[:, h * d:(h + 1) * d], ones, zeros], axis=1)
         for h in range(hpb)], axis=1)

    def logits_h(h):
        sl = slice(h * d, (h + 1) * d)
        return prod._logits(xq[:, sl] * c2, xk[:, sl], mask_bias)

    lg = logits_h(0) if pipelined else None
    for h in range(hpb):
        logits = lg if pipelined else logits_h(h)
        if pipelined:
            lg = logits_h(h + 1) if h + 1 < hpb else None
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp2(logits - m).astype(xv.dtype)  # one fused chain -> bf16
        ol = jnp.dot(e, vaug[:, h * 128:(h + 1) * 128],
                     preferred_element_type=jnp.float32)  # [S, 128]
        l = ol[:, d:d + 1]
        o_ref[:, h * d:(h + 1) * d] = (ol[:, :d] / l).astype(o_ref.dtype)
        lse_ref[0, 0, :, h:h + 1] = m + jnp.log2(l)


def _fwd_kernel_pipe(q_ref, k_ref, v_ref, o_ref, lse_ref, *, d, hpb,
                     sm_scale, valid_len):
    xq = q_ref[...]
    xk = k_ref[...]
    xv = v_ref[...]
    s = xq.shape[0]
    mask_bias = prod._mask_bias(s, valid_len)
    c2 = jnp.asarray(sm_scale * _LOG2_E, xq.dtype)

    def logits_h(h):
        sl = slice(h * d, (h + 1) * d)
        return prod._logits(xq[:, sl] * c2, xk[:, sl], mask_bias)

    lg = logits_h(0)
    for h in range(hpb):
        sl = slice(h * d, (h + 1) * d)
        logits = lg
        lg = logits_h(h + 1) if h + 1 < hpb else None
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp2(logits - m)
        l = jnp.sum(e, axis=-1, keepdims=True)
        o = jnp.dot(e.astype(xv.dtype), xv[:, sl],
                    preferred_element_type=jnp.float32)
        o_ref[:, sl] = (o / l).astype(o_ref.dtype)
        lse_ref[0, 0, :, h:h + 1] = m + jnp.log2(l)


def fwd_variant(kernel_fn, **kw):
    def run(qkv):
        w = qkv.shape[-1] // 3
        d = w // H
        hpb = HPB
        cols = hpb * d
        n_prog = H // hpb
        at = prod._specs(S, cols, n_prog // G)
        out, lse = pl.pallas_call(
            functools.partial(kernel_fn, d=d, hpb=hpb,
                              sm_scale=1.0 / (d ** 0.5), valid_len=513, **kw),
            out_shape=(
                jax.ShapeDtypeStruct((B * S, w), qkv.dtype),
                jax.ShapeDtypeStruct((B, n_prog, S, hpb), jnp.float32),
            ),
            grid=(B, n_prog),
            in_specs=[at(0), at(1), at(2)],
            out_specs=(
                pl.BlockSpec((S, cols), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, S, hpb), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
        )(qkv, qkv, qkv)
        return out, lse
    return run


# ---------------------------------------------------------------- bwd B

def _bwd_kernel_pipe(q_ref, k_ref, v_ref, g_ref, lse_ref,
                     dq_ref, dk_ref, dv_ref, *, d, hpb, sm_scale, valid_len):
    xq = q_ref[...]
    xk = k_ref[...]
    xv = v_ref[...]
    xg = g_ref[...]
    io = xq.dtype
    s = xq.shape[0]
    mask_bias = prod._mask_bias(s, valid_len)
    c2 = jnp.asarray(sm_scale * _LOG2_E, io)

    def logits_h(h):
        sl = slice(h * d, (h + 1) * d)
        return prod._logits(xq[:, sl] * c2, xk[:, sl], mask_bias)

    lg = logits_h(0)
    for h in range(hpb):
        sl = slice(h * d, (h + 1) * d)
        q, k, v, g = xq[:, sl], xk[:, sl], xv[:, sl], xg[:, sl]
        lse = lse_ref[0, 0, :, h:h + 1]
        logits = lg
        lg = logits_h(h + 1) if h + 1 < hpb else None
        p = jnp.exp2(logits - lse)
        pc = p.astype(io)
        dv = jax.lax.dot_general(
            pc, g, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            g, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        delta = jnp.sum(p * dp, axis=-1, keepdims=True)
        ds = (p * (dp - delta)).astype(io)
        dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * sm_scale
        dk = jax.lax.dot_general(
            ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        dq_ref[:, sl] = dq.astype(dq_ref.dtype)
        dk_ref[:, sl] = dk.astype(dk_ref.dtype)
        dv_ref[:, sl] = dv.astype(dv_ref.dtype)


def _bwd_kernel_bf16p(q_ref, k_ref, v_ref, g_ref, lse_ref,
                      dq_ref, dk_ref, dv_ref, *, d, hpb, sm_scale, valid_len):
    """Backward with p held only in bf16 (pc): the delta and ds chains read
    half the VMEM bytes; dp stays f32 (MXU output). Gradient error vs the
    production kernel ~ bf16 rounding of p."""
    xq = q_ref[...]
    xk = k_ref[...]
    xv = v_ref[...]
    xg = g_ref[...]
    io = xq.dtype
    s = xq.shape[0]
    mask_bias = prod._mask_bias(s, valid_len)
    c2 = jnp.asarray(sm_scale * _LOG2_E, io)
    for h in range(hpb):
        sl = slice(h * d, (h + 1) * d)
        q, k, v, g = xq[:, sl], xk[:, sl], xv[:, sl], xg[:, sl]
        lse = lse_ref[0, 0, :, h:h + 1]
        logits = prod._logits(q * c2, k, mask_bias)
        pc = jnp.exp2(logits - lse).astype(io)  # one chain, bf16 out only
        dv = jax.lax.dot_general(
            pc, g, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            g, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        delta = jnp.sum(pc.astype(jnp.float32) * dp, axis=-1, keepdims=True)
        ds = (pc.astype(jnp.float32) * (dp - delta)).astype(io)
        dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * sm_scale
        dk = jax.lax.dot_general(
            ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        dq_ref[:, sl] = dq.astype(dq_ref.dtype)
        dk_ref[:, sl] = dk.astype(dk_ref.dtype)
        dv_ref[:, sl] = dv.astype(dv_ref.dtype)


def _bwd_kernel_odot(q_ref, k_ref, v_ref, g_ref, lse_ref,
                     dq_ref, dk_ref, dv_ref, *, d, hpb, sm_scale, valid_len,
                     bf16p: bool, pipelined: bool):
    """delta via output recompute: delta_i = rowsum(p*dp)_i = g_i . (p v)_i
    (exact reassociation), so the two [S, S] VPU passes (p*dp + row reduce)
    become one extra [S,S]@[S,D] MXU dot and a [S, D] elementwise rowsum.
    bf16p additionally keeps p only as the bf16 pc (dv/odot operand), making
    the exp2 rebuild a single chain; ds then upcasts pc once."""
    xq = q_ref[...]
    xk = k_ref[...]
    xv = v_ref[...]
    xg = g_ref[...]
    io = xq.dtype
    s = xq.shape[0]
    mask_bias = prod._mask_bias(s, valid_len)
    c2 = jnp.asarray(sm_scale * _LOG2_E, io)

    def logits_h(h):
        sl = slice(h * d, (h + 1) * d)
        return prod._logits(xq[:, sl] * c2, xk[:, sl], mask_bias)

    lg = logits_h(0) if pipelined else None
    for h in range(hpb):
        sl = slice(h * d, (h + 1) * d)
        q, k, v, g = xq[:, sl], xk[:, sl], xv[:, sl], xg[:, sl]
        lse = lse_ref[0, 0, :, h:h + 1]
        logits = lg if pipelined else logits_h(h)
        if pipelined:
            lg = logits_h(h + 1) if h + 1 < hpb else None
        if bf16p:
            pc = jnp.exp2(logits - lse).astype(io)
            pf = pc.astype(jnp.float32)
        else:
            pf = jnp.exp2(logits - lse)
            pc = pf.astype(io)
        dv = jax.lax.dot_general(
            pc, g, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o = jnp.dot(pc, v, preferred_element_type=jnp.float32)  # [S, D]
        delta = jnp.sum(g.astype(jnp.float32) * o, axis=-1, keepdims=True)
        dp = jax.lax.dot_general(
            g, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = (pf * (dp - delta)).astype(io)
        dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * sm_scale
        dk = jax.lax.dot_general(
            ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        dq_ref[:, sl] = dq.astype(dq_ref.dtype)
        dk_ref[:, sl] = dk.astype(dk_ref.dtype)
        dv_ref[:, sl] = dv.astype(dv_ref.dtype)


def bwd_variant(kernel_fn, **kw):
    def run(qkv, lse, g):
        w = qkv.shape[-1] // 3
        d = w // H
        hpb = HPB
        cols = hpb * d
        at = prod._specs(S, cols, H // hpb // G)
        grad_spec = pl.BlockSpec((S, cols), lambda i, j: (i, j),
                                 memory_space=pltpu.VMEM)
        lse_spec = pl.BlockSpec((1, 1, S, hpb), lambda i, j: (i, j, 0, 0),
                                memory_space=pltpu.VMEM)
        shape = jax.ShapeDtypeStruct((B * S, w), qkv.dtype)
        return pl.pallas_call(
            functools.partial(kernel_fn, d=d, hpb=hpb,
                              sm_scale=1.0 / (d ** 0.5), valid_len=513, **kw),
            out_shape=(shape, shape, shape),
            grid=(B, H // hpb),
            in_specs=[at(0), at(1), at(2), grad_spec, lse_spec],
            out_specs=(grad_spec, grad_spec, grad_spec),
        )(qkv, qkv, qkv, g, lse)
    return run


def main():
    print(f"backend={jax.default_backend()} device={jax.devices()[0]}")
    key = jax.random.PRNGKey(0)
    qkv = jax.random.normal(key, (B * S, 3 * W), jnp.bfloat16)
    gout = jax.random.normal(jax.random.PRNGKey(1), (B * S, W), jnp.bfloat16)

    fwdA = fwd_variant(prod._fwd_kernel)
    fwdB = fwd_variant(_fwd_kernel_sumdot, pipelined=False)
    fwdC = fwd_variant(_fwd_kernel_pipe)
    fwdD = fwd_variant(_fwd_kernel_sumdot, pipelined=True)

    outA, lseA = jax.jit(fwdA)(qkv)
    for name, fn in [("fwdA_prod", fwdA), ("fwdB_sumdot", fwdB),
                     ("fwdC_pipe", fwdC), ("fwdD_sumdot_pipe", fwdD)]:
        try:
            out, lse = jax.jit(fn)(qkv)
            err = jnp.max(jnp.abs(out[:, :].astype(jnp.float32)
                                  - outA.astype(jnp.float32))).item()
            dt = device_time(f"attn_{name}", fn, (qkv,), iters=20)
            print(f"{name:18s} {dt*1e6:8.1f} us/call  max|d out| {err:.2e}",
                  flush=True)
        except Exception as e:
            print(f"{name:18s} FAILED: {str(e).splitlines()[0][:110]}",
                  flush=True)

    bwdA = bwd_variant(prod._bwd_kernel)
    bwdB = bwd_variant(_bwd_kernel_pipe)
    refA = jax.jit(bwdA)(qkv, lseA, gout)
    bwdC = bwd_variant(_bwd_kernel_bf16p)
    bwdD = bwd_variant(_bwd_kernel_odot, bf16p=False, pipelined=False)
    bwdE = bwd_variant(_bwd_kernel_odot, bf16p=True, pipelined=False)
    bwdF = bwd_variant(_bwd_kernel_odot, bf16p=True, pipelined=True)
    for name, fn in [("bwdA_prod", bwdA), ("bwdB_pipe", bwdB),
                     ("bwdC_bf16p", bwdC), ("bwdD_odot", bwdD),
                     ("bwdE_odot_bf16p", bwdE), ("bwdF_odot_b16_pipe", bwdF)]:
        try:
            outs = jax.jit(fn)(qkv, lseA, gout)
            err = max(jnp.max(jnp.abs(a.astype(jnp.float32)
                                      - b.astype(jnp.float32))).item()
                      for a, b in zip(outs, refA))
            dt = device_time(f"attn_{name}", fn, (qkv, lseA, gout), iters=20)
            print(f"{name:18s} {dt*1e6:8.1f} us/call  max|d| {err:.2e}",
                  flush=True)
        except Exception as e:
            print(f"{name:18s} FAILED: {str(e).splitlines()[0][:110]}",
                  flush=True)


if __name__ == "__main__":
    main()
