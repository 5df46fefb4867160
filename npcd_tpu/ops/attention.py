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
