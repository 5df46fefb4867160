"""NPCD transformer denoiser (flax).

TPU-native rebuild of the reference denoiser
(npcd/models/diffusion/denoisers/transformer.py): a pre-LN transformer over
512 point tokens + 1 prepended timestep-conditioning token. Matches the
reference's parameterization:

  * fused qkv projection Linear(width, 3*width), per-block init
    N(0, (0.25/sqrt(width))^2), biases zero
  * 4x MLP with exact (erf) GELU
  * time conditioning: sinusoidal timestep embedding -> width-MLP -> one
    extra sequence token (no AdaLN)
  * zero-initialized output projection
  * LayerNorm eps 1e-5, computed in float32 under mixed precision

Attention runs through npcd_tpu.ops.multi_head_attention (Pallas flash
kernel on TPU, einsum fallback elsewhere), mirroring the reference's
flash-attn / einsum dual path.
"""
from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.attention import fused_qkv_attention


def timestep_embedding(timesteps: jnp.ndarray, dim: int, max_period: int = 10000) -> jnp.ndarray:
    """Sinusoidal timestep embeddings, [N] -> [N, dim]
    (reference transformer.py:33-49; cos first, then sin)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        embedding = jnp.concatenate([embedding, jnp.zeros_like(embedding[:, :1])], axis=-1)
    return embedding


def _normal_init(std: float):
    return nn.initializers.normal(stddev=std)


class FusedLayerNorm(nn.Module):
    """LayerNorm with f32 statistics and input-dtype output.

    Parameter layout matches flax nn.LayerNorm (scale, bias) so checkpoints
    and the torch weight converter are unaffected. On TPU (impl="auto") it
    dispatches to the fused Pallas kernel — XLA lowers the f32 LayerNorm to
    a multi-pass convert/reduce fusion that dominated the train step
    (measured ~1.7 ms per LN over [32, 513, 1024] on v5e).

    Matches the reference's F.layer_norm-under-AMP semantics
    (npcd/models/diffusion/denoisers/transformer.py:23-24): statistics in
    f32, consumer casts the result to compute dtype anyway.
    """

    epsilon: float = 1e-5
    impl: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray, delta: Optional[jnp.ndarray] = None):
        """delta=None: returns ln(x). With delta: returns (r, ln(r)) where
        r = x + delta — the residual add fused into the norm kernel."""
        w = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (w,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (w,), jnp.float32)
        impl = self.impl
        if impl == "auto":
            impl = (
                "pallas"
                if jax.default_backend() == "tpu" and w % 128 == 0 and x.ndim == 3
                else "xla"
            )
        if impl == "pallas":
            from ...ops.pallas.layer_norm import layer_norm, layer_norm_residual

            if delta is None:
                return layer_norm(x, scale, bias, self.epsilon)
            return layer_norm_residual(x, delta, scale, bias, self.epsilon)

        r32 = x.astype(jnp.float32)
        if delta is not None:
            r32 = r32 + delta.astype(jnp.float32)
        mean = r32.mean(-1, keepdims=True)
        var = ((r32 - mean) ** 2).mean(-1, keepdims=True)
        y = ((r32 - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
             ).astype(x.dtype)
        if delta is None:
            return y
        return r32.astype(x.dtype), y


def _torch_linear_init(in_features: int):
    """torch.nn.Linear default init: U(-1/sqrt(in), 1/sqrt(in))."""
    bound = 1.0 / math.sqrt(in_features)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


class TransformerMLP(nn.Module):
    """4x-expansion MLP with exact GELU (reference transformer.py:118-136)."""

    width: int
    init_scale: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(
            self.width * 4,
            kernel_init=_normal_init(self.init_scale),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="c_fc",
        )(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(
            self.width,
            kernel_init=_normal_init(self.init_scale),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="c_proj",
        )(x)
        return x


class MultiheadAttention(nn.Module):
    width: int
    heads: int
    init_scale: float
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, s, _ = x.shape
        qkv = nn.Dense(
            self.width * 3,
            kernel_init=_normal_init(self.init_scale),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="c_qkv",
        )(x)
        # The projection's output channels use a global [Q|K|V] order (heads
        # contiguous within each third) instead of the reference's per-head
        # [q|k|v] groups (transformer.py:71-73) so the Pallas kernel can map
        # tiled views of the fused tensor with zero HBM copies; the torch
        # weight converter permutes the columns once at load time.
        # NOTE: jax checkpoints saved before this layout change (any
        # pre-fused-qkv-kernel snapshot) hold per-head-ordered c_qkv columns
        # and are NOT loadable into this model without the same permutation
        # (convert_reference._permute_qkv_global applied to the kernel/bias).
        out = fused_qkv_attention(qkv, self.heads, impl=self.attn_impl)
        out = nn.Dense(
            self.width,
            kernel_init=_normal_init(self.init_scale),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="c_proj",
        )(out)
        return out


class ResidualAttentionBlock(nn.Module):
    """Pre-LN block computing x + attn(ln1(x)) + mlp(ln2(x + attn(...))).

    The residual adds are deferred: the block takes (x, pending) where
    `pending` is the previous sublayer's un-added output, and returns
    (x', mlp_out) with the mlp output left pending for the next block's
    ln_1 (or ln_post) to fold in. Each add then fuses into a LayerNorm
    kernel instead of a separate HBM pass — numerically identical to the
    reference's eager adds (transformer.py:169-172)."""

    width: int
    heads: int
    init_scale: float
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray, pending: Optional[jnp.ndarray] = None):
        ln = lambda name: FusedLayerNorm(name=name)
        if pending is None:
            y1 = ln("ln_1")(x)
        else:
            x, y1 = ln("ln_1")(x, pending)
        attn_out = MultiheadAttention(
            width=self.width,
            heads=self.heads,
            init_scale=self.init_scale,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            name="attn",
        )(y1.astype(self.dtype))
        x, y2 = ln("ln_2")(x, attn_out)
        mlp_out = TransformerMLP(
            width=self.width,
            init_scale=self.init_scale,
            dtype=self.dtype,
            name="mlp",
        )(y2.astype(self.dtype))
        return x, mlp_out


class NPCDTransformer(nn.Module):
    """Joint coords+feats epsilon-prediction denoiser.

    Inputs:  coords [N, coords_dim, P], feats [N, feats_dim, P], t [N]
    Outputs: (eps_coords [N, coords_dim, P], eps_feats [N, feats_dim, P])
    """

    coords_dim: int = 3
    feats_dim: int = 32
    width: int = 1024
    layers: int = 24
    heads: int = 16
    init_scale: float = 0.25
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    remat: bool = False  # rematerialize blocks (trade FLOPs for HBM in training)
    # remat granularity: "full" recomputes whole blocks; "dots" saves matmul
    # outputs and recomputes only elementwise ops (layernorm/gelu/softmax) —
    # ~10% extra FLOPs instead of ~33%, at higher activation memory
    remat_policy: str = "full"

    @nn.compact
    def __call__(self, coords: jnp.ndarray, feats: jnp.ndarray, t: jnp.ndarray):
        n = coords.shape[0]
        in_channels = self.coords_dim + self.feats_dim
        block_init_scale = self.init_scale * math.sqrt(1.0 / self.width)

        x = jnp.concatenate([coords, feats], axis=1)  # [N, C, P]
        h = jnp.transpose(x, (0, 2, 1)).astype(self.dtype)  # [N, P, C]
        h = nn.Dense(
            self.width,
            kernel_init=_torch_linear_init(in_channels),
            bias_init=_torch_linear_init(in_channels),
            dtype=self.dtype,
            name="input_proj",
        )(h)

        t_embed = TransformerMLP(
            width=self.width,
            init_scale=block_init_scale,
            dtype=self.dtype,
            name="time_embed",
        )(timestep_embedding(t, self.width).astype(self.dtype))  # [N, width]

        h = jnp.concatenate([t_embed[:, None, :], h], axis=1)  # [N, P+1, width]

        h = FusedLayerNorm(name="ln_pre")(h)
        h = h.astype(self.dtype)
        if self.remat:
            policy = None
            if self.remat_policy == "dots":
                policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            block_cls = nn.remat(ResidualAttentionBlock, policy=policy)
        else:
            block_cls = ResidualAttentionBlock
        pending = None
        for i in range(self.layers):
            h, pending = block_cls(
                width=self.width,
                heads=self.heads,
                init_scale=block_init_scale,
                dtype=self.dtype,
                attn_impl=self.attn_impl,
                name=f"resblocks_{i}",
            )(h, pending)
        _, h = FusedLayerNorm(name="ln_post")(h, pending)
        h = h[:, 1:]  # drop the time token
        h = nn.Dense(
            in_channels,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=jnp.float32,
            name="output_proj",
        )(h.astype(jnp.float32))
        pred = jnp.transpose(h, (0, 2, 1))  # [N, C, P]
        return pred[:, : self.coords_dim], pred[:, self.coords_dim:]
