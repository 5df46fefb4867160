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


def _einsum_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, valid_len: int | None = None
) -> jnp.ndarray:
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.sqrt(jnp.asarray(d, jnp.float32))).astype(q.dtype)
    # [B, H, Sq, Sk]
    logits = jnp.einsum("bthc,bshc->bhts", q * scale, k * scale)
    logits = logits.astype(jnp.float32)
    if valid_len is not None and valid_len < k.shape[1]:
        key_idx = jnp.arange(k.shape[1])
        logits = jnp.where(key_idx[None, None, None, :] < valid_len, logits, -1e30)
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhts,bshc->bthc", weights, v)


def split_grouped_qkv(qkv: jnp.ndarray, heads: int, groups: int = 1):
    """Split fused qkv [..., 3W] in the grouped [Q|K|V] channel layout
    (ops/pallas/fused_qkv_attention.py module docstring; groups=1 is the
    global [Q|K|V] order) into q, k, v each [..., H, D] head-major."""
    *lead, w3 = qkv.shape
    w = w3 // 3
    d = w // heads
    hg = heads // groups
    x = qkv.reshape(*lead, groups, 3, hg, d)
    return tuple(
        x[..., t, :, :].reshape(*lead, heads, d) for t in range(3)
    )


def default_qkv_groups(heads: int, d: int) -> int:
    """Default grouped-qkv layout group count for a head geometry.

    Chooses G = heads / hpb where hpb is the Pallas kernel's preferred
    per-program head block — the grouped layout then has exactly one kernel
    block per (group, third), so the kernel geometry (grid, block shapes,
    VMEM footprint) is identical to the global [Q|K|V] layout and tensor
    parallelism up to tp=G splits on whole head groups for free. Falls back
    to 1 (global layout) when the geometry can't tile the 128-lane dim
    (small test models on the einsum path). Flagship (16 heads, D=64): G=2.
    Configs targeting tp>G must set qkv_groups explicitly (any G with
    heads % G == 0 and (heads/G)*D a lane multiple works, e.g. G=8 for
    tp=4/8 at the flagship geometry)."""
    from .pallas.fused_qkv_attention import _heads_per_block

    hpb = _heads_per_block(heads, d, 1)
    if (hpb * d) % 128 == 0 and heads % hpb == 0:
        return heads // hpb
    return 1


def _pallas_qkv_supported(heads: int, d: int, groups: int, dtype) -> bool:
    from .pallas.fused_qkv_attention import _heads_per_block

    if heads % groups:
        return False
    hpb = _heads_per_block(heads, d, groups)
    # the per-program column width must tile the 128-lane dim (or span the
    # whole per-group third, i.e. hpb == heads//groups with (hpb*d) % 128 == 0)
    return (
        _on_tpu()
        and d in (64, 128)
        and (hpb * d) % 128 == 0
        and dtype in (jnp.float32, jnp.bfloat16)
    )


def fused_qkv_attention(
    qkv: jnp.ndarray,
    heads: int,
    impl: str = "auto",
    valid_len: int | None = None,
    groups: int = 1,
) -> jnp.ndarray:
    """Attention over fused qkv [B, S, 3W] in the grouped [Q|K|V] channel
    layout (groups head groups, each internally [Q_g|K_g|V_g]; groups=1 is
    the global [Q|K|V] order) -> [B, S, W] head-major.

    On TPU ("auto"/"pallas") this dispatches to the zero-copy Pallas kernel
    that reads the fused tensor via three index-mapped views — no HBM-level
    transpose, pad, or split (ops/pallas/fused_qkv_attention.py). Other
    impls split the thirds and go through multi_head_attention.

    valid_len: if S carries padding tokens (the denoiser pads the sequence
    to a sublane multiple so reshapes around the kernel are bitcasts), keys
    at positions >= valid_len are masked out of the softmax. Pad-query
    outputs are unspecified; callers discard them.

    Note the layout differs from the reference's per-head [q|k|v] groups
    (transformer.py:71-73); the weight converter permutes the projection
    columns once at load time."""
    b, s, w3 = qkv.shape
    w = w3 // 3
    d = w // heads
    if valid_len is not None and valid_len >= s:
        valid_len = None
    if impl == "auto":
        # the 2D kernel's row blocks start at i*s: s must be a sublane
        # multiple (or there is only one sequence)
        supported = _pallas_qkv_supported(heads, d, groups, qkv.dtype) and (
            s % 8 == 0 or b == 1
        )
        impl = "pallas" if supported else "einsum"
    if impl == "pallas":
        from .pallas.fused_qkv_attention import fused_qkv_attention as _kernel

        return _kernel(qkv, heads, valid_len, groups)
    q, k, v = split_grouped_qkv(qkv, heads, groups)
    return multi_head_attention(q, k, v, impl=impl, valid_len=valid_len).reshape(b, s, w)


def fused_qkv_attention_tokens(
    qkv: jnp.ndarray,
    heads: int,
    batch: int,
    seq: int,
    impl: str = "auto",
    valid_len: int | None = None,
    groups: int = 1,
) -> jnp.ndarray:
    """2D-token variant of fused_qkv_attention: qkv [B*S, 3W] -> [B*S, W],
    rows batch-major. On TPU this feeds the Pallas kernel the 2D array
    directly (its BlockSpecs select per-sequence row blocks), so no 3D
    tensor exists at the custom-call boundary — XLA otherwise folds the
    boundary reshapes into neighbouring projection matmuls and emits them
    as slow batch-in-sublanes convolutions."""
    w = qkv.shape[-1] // 3
    d = w // heads
    if valid_len is not None and valid_len >= seq:
        valid_len = None
    if impl == "auto":
        supported = _pallas_qkv_supported(heads, d, groups, qkv.dtype) and seq % 8 == 0
        impl = "pallas" if supported else "einsum"
    if impl == "pallas":
        from .pallas.fused_qkv_attention import fused_qkv_attention_2d

        return fused_qkv_attention_2d(qkv, heads, batch, seq, valid_len, groups)
    out = fused_qkv_attention(
        qkv.reshape(batch, seq, 3 * w), heads, impl=impl, valid_len=valid_len,
        groups=groups,
    )
    return out.reshape(batch * seq, w)


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    impl: str = "auto",
    valid_len: int | None = None,
) -> jnp.ndarray:
    """Non-causal multi-head attention over [B, S, H, D] tensors."""
    if impl == "auto":
        impl = "pallas" if _pallas_supported(q) and valid_len is None else "einsum"
    if impl == "einsum":
        return _einsum_attention(q, k, v, valid_len)
    if valid_len is not None:
        raise NotImplementedError(f"valid_len masking not supported for impl={impl}")
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
