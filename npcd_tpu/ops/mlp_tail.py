"""Dense layer with the bias gradient folded into the dW matmul.

Problem (measured on v5e at the 302M denoiser config): the cotangent at
the c_fc output is ds = (dy @ c_proj_kernel^T) * gelu'(a) — an
unmaterialized elementwise expression. XLA duplicates it into each
consumer: the dW and dX matmuls hide the gelu' recompute behind the MXU
(their convs run at ~full matmul rate), but the bias gradient colsum has
no MXU work to hide behind — it became a standalone fusion re-reading
both [M, 4W] tensors and re-running the transcendental: 0.73 ms/layer,
17.6 ms/step, the single largest non-matmul cost in the train step.

Two rejected fixes, both measured slower end-to-end:
  * materializing ds once (optimization_barrier in a gelu custom-vjp)
    just moves the unhidden 0.73 ms pass, and adds the write;
  * computing ds inside a Pallas kernel fused with the dX matmul —
    Mosaic executes the epilogue's VPU work serially after the program's
    MXU work (1.19 ms/call vs 0.73 for the bare dX matmul); only XLA's
    emitter interleaves elementwise producers with MXU tiles.

The fix that works WITH the XLA schedule: make the bias gradient ride the
dW matmul. ``dense_bias_in_dw`` is a Dense whose custom backward computes

    [dW; db] = concat([x, 1], axis=1)^T @ g

as ONE dot ([in+1, out] output, +1/in extra MXU rows ~= +0.1%), so g's
producer expression still fuses into exactly two MXU consumers and the
standalone bias fusion disappears. Forward numerics are byte-identical to
flax Dense (same op order); dW/dX gradients are the same dots as autodiff;
db changes only its reduction algorithm (MXU f32 accumulation over rows
instead of a VPU tree reduce — same math, >= precision).

Reference context: the MLP is reference transformer.py:118-136; the
reference leans on cuBLAS+autograd, this is the TPU-native equivalent of
a fused-epilogue backward.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _plain_dense(x, kernel, bias, dtype):
    return x.astype(dtype) @ kernel.astype(dtype) + bias.astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _dense_fused_bias_grad(x, kernel, bias, dtype):
    return _plain_dense(x, kernel, bias, dtype)


def _fused_fwd(x, kernel, bias, dtype):
    return _plain_dense(x, kernel, bias, dtype), (x, kernel)


def _fused_bwd(dtype, res, g):
    x, kernel = res
    m = x.shape[0]
    xa = jnp.concatenate(
        [x.astype(dtype), jnp.ones((m, 1), dtype)], axis=1
    )
    # [in+1, out] f32: rows 0..in-1 are dW, row in is db = colsum(g)
    dwb = jax.lax.dot_general(
        xa, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dw = dwb[:-1].astype(kernel.dtype)
    db = dwb[-1].astype(kernel.dtype)
    dx = jax.lax.dot_general(
        g, kernel.astype(dtype), dimension_numbers=(((1,), (1,)), ((), ())),
    ).astype(x.dtype)
    return dx, dw, db


_dense_fused_bias_grad.defvjp(_fused_fwd, _fused_bwd)


def dense_bias_in_dw(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    dtype,
    impl: str = "auto",
) -> jnp.ndarray:
    """x @ kernel + bias (flax Dense semantics and numerics) whose backward
    folds the bias gradient into the dW matmul (see module docstring).

    x: [M, in] 2D tokens; kernel: [in, out]; bias: [out] (params in any
    float dtype, cast to ``dtype`` for compute like nn.Dense). impl:
    "auto" (fused backward on TPU, plain autodiff elsewhere), "fused", or
    "plain".
    """
    if impl == "auto":
        impl = "fused" if (
            x.ndim == 2 and jax.default_backend() == "tpu"
        ) else "plain"
    if impl == "fused":
        return _dense_fused_bias_grad(x, kernel, bias, dtype)
    return _plain_dense(x, kernel, bias, dtype)
