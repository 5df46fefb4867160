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

from ...ops.attention import multi_head_attention


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
        # Match the reference's fused-qkv layout: the projection is split
        # per-head into contiguous [q|k|v] channel groups
        # (reference transformer.py:71-73).
        head_dim = self.width // self.heads
        qkv = qkv.reshape(n, s, self.heads, 3 * head_dim)
        q, k, v = jnp.split(qkv, 3, axis=-1)  # each [N, S, H, D]
        out = multi_head_attention(q, k, v, impl=self.attn_impl)
        out = out.reshape(n, s, self.width)
        out = nn.Dense(
            self.width,
            kernel_init=_normal_init(self.init_scale),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="c_proj",
        )(out)
        return out


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    init_scale: float
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=name)
        x = x + MultiheadAttention(
            width=self.width,
            heads=self.heads,
            init_scale=self.init_scale,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            name="attn",
        )(ln("ln_1")(x).astype(self.dtype))
        x = x + TransformerMLP(
            width=self.width,
            init_scale=self.init_scale,
            dtype=self.dtype,
            name="mlp",
        )(ln("ln_2")(x).astype(self.dtype))
        return x


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

        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_pre")(h)
        h = h.astype(self.dtype)
        block_cls = nn.remat(ResidualAttentionBlock) if self.remat else ResidualAttentionBlock
        for i in range(self.layers):
            h = block_cls(
                width=self.width,
                heads=self.heads,
                init_scale=block_init_scale,
                dtype=self.dtype,
                attn_impl=self.attn_impl,
                name=f"resblocks_{i}",
            )(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_post")(h)
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
