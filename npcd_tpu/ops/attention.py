"""Multi-head attention backends.

The reference denoiser uses CUDA flash-attn with an einsum fallback
(npcd/models/diffusion/denoisers/transformer.py:68-84). The TPU build keeps
the same dual-path structure:

  * ``einsum``  — plain softmax attention, numerically matching the reference
    fallback (q and k are pre-scaled by 1/sqrt(sqrt(d)) for low-precision
    stability before the logits matmul).
  * ``pallas``  — fused flash-attention Pallas kernel (ops/pallas/flash_attention.py).
  * ``auto``    — pallas on TPU when shapes allow, einsum otherwise.

All paths take [B, S, H, D] q/k/v (the flash-attn layout used by the
reference) and return [B, S, H, D].
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _einsum_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.sqrt(jnp.asarray(d, jnp.float32))).astype(q.dtype)
    # [B, H, Sq, Sk]
    logits = jnp.einsum("bthc,bshc->bhts", q * scale, k * scale)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhts,bshc->bthc", weights, v)


def fused_qkv_attention(
    qkv: jnp.ndarray, heads: int, impl: str = "auto"
) -> jnp.ndarray:
    """Attention over fused qkv [B, S, 3W] in *global* [Q|K|V] channel order
    (heads contiguous within each third) -> [B, S, W].

    On TPU ("auto"/"pallas") this dispatches to the zero-copy Pallas kernel
    that reads the fused tensor via three index-mapped views — no HBM-level
    transpose, pad, or split (ops/pallas/fused_qkv_attention.py). Other
    impls split the thirds and go through multi_head_attention.

    Note the layout differs from the reference's per-head [q|k|v] groups
    (transformer.py:71-73); the weight converter permutes the projection
    columns once at load time."""
    b, s, w3 = qkv.shape
    w = w3 // 3
    d = w // heads
    if impl == "auto":
        from .pallas.fused_qkv_attention import _heads_per_block

        hpb = _heads_per_block(heads, d)
        supported = (
            _on_tpu()
            and d in (64, 128)
            # the head-group column width must tile the 128-lane dim
            # (or span the whole third, i.e. hpb == heads with w % 128 == 0)
            and (hpb * d) % 128 == 0
            and qkv.dtype in (jnp.float32, jnp.bfloat16)
        )
        impl = "pallas" if supported else "einsum"
    if impl == "pallas":
        from .pallas.fused_qkv_attention import fused_qkv_attention as _kernel

        return _kernel(qkv, heads)
    q, k, v = (x.reshape(b, s, heads, d) for x in jnp.split(qkv, 3, axis=-1))
    return multi_head_attention(q, k, v, impl=impl).reshape(b, s, w)


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    impl: str = "auto",
) -> jnp.ndarray:
    """Non-causal multi-head attention over [B, S, H, D] tensors."""
    if impl == "auto":
        impl = "pallas" if _pallas_supported(q) else "einsum"
    if impl == "einsum":
        return _einsum_attention(q, k, v)
    if impl == "xla":
        # XLA's fused attention path; scaling folded into the op.
        return jax.nn.dot_product_attention(q, k, v)
    if impl == "pallas":
        from .pallas.flash_attention import flash_attention

        return flash_attention(q, k, v)
    raise ValueError(f"unknown attention impl: {impl}")


@functools.cache
def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _pallas_supported(q: jnp.ndarray) -> bool:
    # The pallas kernel needs a TPU backend and a head dim that maps onto
    # MXU/VPU lanes.
    return _on_tpu() and q.shape[-1] in (64, 128) and q.dtype in (
        jnp.float32,
        jnp.bfloat16,
    )
