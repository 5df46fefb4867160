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

import functools
import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.attention import fused_qkv_attention_tokens
from ...ops.mlp_tail import dense_bias_in_dw


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


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def tp_replicate(x: jnp.ndarray, axis: str) -> jnp.ndarray:
    """Megatron's "f" operator: identity forward, psum over the tensor-
    parallel mesh axis backward.

    Inserted where a replicated activation enters a column-parallel branch
    (inside shard_map): the local backward only carries this shard's
    contribution to the activation's cotangent, and the psum restores the
    full (replicated) cotangent so every upstream replicated parameter gets
    its complete gradient. The matching "g" (psum forward, identity
    backward) is the explicit psum after each row-parallel projection."""
    return x


def _tp_replicate_fwd(x, axis):
    return x, None


def _tp_replicate_bwd(axis, _, ct):
    return (jax.lax.psum(ct, axis),)


tp_replicate.defvjp(_tp_replicate_fwd, _tp_replicate_bwd)


class RowParallelDense(nn.Module):
    """Row-parallel Dense for shard_map tensor parallelism: the kernel holds
    this shard's rows ([in/tp, out]); the matmul produces a partial result
    that is psum'd over the model axis, and the (replicated) bias is added
    once after the reduction. Parameter names match nn.Dense so single-
    device checkpoints shard transparently (parallel/tp.py row specs)."""

    features: int
    axis: str
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", self.kernel_init, (x.shape[-1], self.features), jnp.float32
        )
        bias = self.param("bias", self.bias_init, (self.features,), jnp.float32)
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        y = jax.lax.psum(y, self.axis)
        return y + bias.astype(y.dtype)


def _slab_rows(m: int) -> int:
    """Split an [M, W] token matrix into n slabs of M/n rows for the LN
    Pallas grid: the largest n <= 64 dividing M with a sublane-aligned slab
    (M/n a multiple of 8, so the [M, W] -> [n, M/n, W] view is a bitcast;
    e.g. 16640 -> 52 slabs of 320) of at least 64 rows. Falls back to
    unaligned slabs (layout copy) only if M has no aligned split."""
    limit = min(64, m // 64)
    for n in range(limit, 0, -1):
        if m % n == 0 and (m // n) % 8 == 0:
            return n
    for n in range(limit, 0, -1):
        if m % n == 0:
            return n
    return 1


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
        r = x + delta — the residual add fused into the norm kernel.

        Accepts [*, W] of rank 2 or 3; 2D token matrices [M, W] are viewed
        as [n, s, W] slabs for the Pallas grid (a free, layout-preserving
        reshape)."""
        w = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (w,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (w,), jnp.float32)
        impl = self.impl
        if impl == "auto":
            impl = (
                "pallas"
                if jax.default_backend() == "tpu" and w % 128 == 0 and x.ndim in (2, 3)
                else "xla"
            )
        if impl == "pallas":
            from ...ops.pallas.layer_norm import layer_norm, layer_norm_residual

            view = x
            dview = delta
            if x.ndim == 2:
                n = _slab_rows(x.shape[0])
                view = x.reshape(n, -1, w)
                dview = None if delta is None else delta.reshape(n, -1, w)
            if delta is None:
                y = layer_norm(view, scale, bias, self.epsilon)
                return y.reshape(x.shape)
            r, y = layer_norm_residual(view, dview, scale, bias, self.epsilon)
            return r.reshape(x.shape), y.reshape(x.shape)

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


class FusedBiasGradDense(nn.Module):
    """nn.Dense drop-in (same param tree, byte-identical forward) whose
    backward folds the bias gradient into the dW matmul
    (ops/mlp_tail.py). Used for c_fc, whose output cotangent is the
    unmaterialized ds = (dy @ c_proj^T) * gelu'(a) expression — the plain
    autodiff bias colsum re-evaluates it unhidden at 0.73 ms/layer on
    v5e."""

    features: int
    kernel_init: Any
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", self.kernel_init, (jnp.shape(x)[-1], self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return dense_bias_in_dw(x, kernel, bias, self.dtype)


class TransformerMLP(nn.Module):
    """4x-expansion MLP with exact GELU (reference transformer.py:118-136).

    remat_tail (off by default) rematerializes the gelu -> c_proj tail so
    the backward recomputes gelu(a) from the saved hidden `a` instead of
    keeping both activations — a memory/VPU trade for configs that don't
    fit HBM. At the SRN-Cars batch-32 config it measured *slower* (3.27 vs
    3.56 steps/s on v5e): the remat barrier blocks XLA's own
    fusion/remat choices, which already handle the pressure better."""

    width: int
    init_scale: float
    dtype: jnp.dtype = jnp.float32
    remat_tail: bool = False
    # "erf" = reference-exact GELU; "tanh" = tanh approximation. On v5e the
    # erf lowering is NOT overlapped with the MXU (matmul+erf measured 97
    # TFLOPS vs 191 for matmul+tanh == bare matmul), costing ~0.7 ms per
    # c_fc forward at the 302M config. For bf16 activations the two agree
    # to <=1 bf16 ulp on 98.8% of inputs (exhaustive bf16 sweep; the rest
    # are ~1e-38 subnormals), so "tanh" is the bf16 production default via
    # NPCDTransformer.gelu="auto"; strict-parity paths pass "erf".
    gelu: str = "erf"
    # shard_map tensor parallelism (parallel/tp_step.py): c_fc holds 4W/tp
    # output columns, c_proj holds 4W/tp input rows + psum over tp_axis
    tp: int = 1
    tp_axis: str = "model"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.tp > 1:
            x = tp_replicate(x, self.tp_axis)
        a = FusedBiasGradDense(
            features=self.width * 4 // self.tp,
            kernel_init=_normal_init(self.init_scale),
            dtype=self.dtype,
            name="c_fc",
        )(x)

        def tail(mdl, a):
            ga = nn.gelu(a, approximate=mdl.gelu == "tanh")
            if mdl.tp > 1:
                return RowParallelDense(
                    features=mdl.width,
                    axis=mdl.tp_axis,
                    kernel_init=_normal_init(mdl.init_scale),
                    dtype=mdl.dtype,
                    name="c_proj",
                    parent=mdl,
                )(ga)
            return nn.Dense(
                mdl.width,
                kernel_init=_normal_init(mdl.init_scale),
                bias_init=nn.initializers.zeros,
                dtype=mdl.dtype,
                name="c_proj",
                parent=mdl,
            )(ga)

        if self.remat_tail:
            return nn.remat(tail)(self, a)
        return tail(self, a)


class MultiheadAttention(nn.Module):
    """Attention over 2D token matrices [M, W] with M = batch * seq.

    The qkv/out projections run on the flattened tokens (2D dots hit ~98%
    MXU utilization on v5e vs ~57% for the equivalent [B, S, W] 3D dots —
    XLA's batch-in-sublanes convolution emitter); only the attention kernel
    itself sees the [B, S, 3W] view, via a free layout-preserving reshape.
    """

    width: int
    heads: int
    init_scale: float
    seq: int  # padded sequence length (sublane multiple)
    valid_len: int  # real tokens per sequence (num_points + 1 time token)
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    qkv_groups: int = 1
    # shard_map tensor parallelism (parallel/tp_step.py): this shard owns
    # heads/tp heads = qkv_groups/tp whole layout groups; c_qkv holds their
    # 3W/tp output columns, attention runs locally on them, c_proj holds
    # W/tp input rows + psum over tp_axis
    tp: int = 1
    tp_axis: str = "model"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.tp > 1:
            x = tp_replicate(x, self.tp_axis)
        qkv = nn.Dense(
            self.width * 3 // self.tp,
            kernel_init=_normal_init(self.init_scale),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="c_qkv",
        )(x)
        # The projection's output channels use a grouped [Q|K|V] order
        # (qkv_groups head groups, each internally [Q_g|K_g|V_g] with heads
        # contiguous) instead of the reference's per-head [q|k|v] groups
        # (transformer.py:71-73), so (a) the Pallas kernel can map tiled
        # views of the fused tensor with zero HBM copies and (b) a tensor-
        # parallel column split (tp dividing qkv_groups) lands on whole head
        # groups (npcd_tpu/parallel/tp.py). The torch weight converter
        # permutes the columns once at load time.
        # NOTE: the column order depends on qkv_groups — jax checkpoints
        # saved under a different group count (or the old global layout,
        # which is qkv_groups=1) need a one-time permutation
        # (convert_reference.relayout_qkv) before loading.
        out = fused_qkv_attention_tokens(
            qkv,
            self.heads // self.tp,
            batch=qkv.shape[0] // self.seq,
            seq=self.seq,
            impl=self.attn_impl,
            valid_len=self.valid_len,
            groups=self.qkv_groups // self.tp,
        )
        if self.tp > 1:
            return RowParallelDense(
                features=self.width,
                axis=self.tp_axis,
                kernel_init=_normal_init(self.init_scale),
                dtype=self.dtype,
                name="c_proj",
            )(out)
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

    Operates on 2D token matrices [M, W] (M = batch * seq); see
    MultiheadAttention for why. The residual adds are deferred: the block
    takes (x, pending) where `pending` is the previous sublayer's un-added
    output, and returns (x', mlp_out) with the mlp output left pending for
    the next block's ln_1 (or ln_post) to fold in. Each add then fuses into
    a LayerNorm kernel instead of a separate HBM pass — numerically
    identical to the reference's eager adds (transformer.py:169-172)."""

    width: int
    heads: int
    init_scale: float
    seq: int
    valid_len: int
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    qkv_groups: int = 1
    gelu: str = "erf"
    tp: int = 1
    tp_axis: str = "model"

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
            seq=self.seq,
            valid_len=self.valid_len,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            qkv_groups=self.qkv_groups,
            tp=self.tp,
            tp_axis=self.tp_axis,
            name="attn",
        )(y1.astype(self.dtype))
        x, y2 = ln("ln_2")(x, attn_out)
        mlp_out = TransformerMLP(
            width=self.width,
            init_scale=self.init_scale,
            dtype=self.dtype,
            gelu=self.gelu,
            tp=self.tp,
            tp_axis=self.tp_axis,
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
    # grouped [Q|K|V] channel layout of the fused qkv projections: None
    # resolves to ops.attention.default_qkv_groups (G=2 at the flagship
    # geometry). Tensor parallelism requires tp to divide the group count.
    qkv_groups: Optional[int] = None
    # GELU flavor: "auto" -> "tanh" for bf16 compute (<=1 bf16-ulp from
    # exact on 98.8% of bf16 inputs, ~2x faster c_fc fusions on v5e — see
    # TransformerMLP.gelu), "erf" for f32 (reference-exact parity)
    gelu: str = "auto"
    remat: bool = False  # rematerialize blocks (trade FLOPs for HBM in training)
    # remat granularity: "full" recomputes whole blocks; "dots" saves matmul
    # outputs and recomputes only elementwise ops (layernorm/gelu/softmax) —
    # ~10% extra FLOPs instead of ~33%, at higher activation memory
    remat_policy: str = "full"
    # shard_map tensor parallelism: tp > 1 means this module instance runs
    # INSIDE shard_map on a tp-way model axis, with params holding the local
    # shards (parallel/tp.py specs). Requires tp | qkv_groups.
    tp: int = 1
    tp_axis: str = "model"

    def resolved_qkv_groups(self) -> int:
        if self.qkv_groups is not None:
            return self.qkv_groups
        from ...ops.attention import default_qkv_groups

        return default_qkv_groups(self.heads, self.width // self.heads)

    @nn.compact
    def __call__(self, coords: jnp.ndarray, feats: jnp.ndarray, t: jnp.ndarray):
        n, _, p = coords.shape
        qkv_groups = self.resolved_qkv_groups()
        if self.tp > 1 and (qkv_groups % self.tp or self.heads % self.tp):
            raise ValueError(
                f"tensor parallelism needs tp | qkv_groups and tp | heads; got "
                f"tp={self.tp}, qkv_groups={qkv_groups}, heads={self.heads} "
                f"(set qkv_groups explicitly on the model)"
            )
        valid = p + 1  # real tokens: points + 1 time token
        seq = -(-valid // 8) * 8  # padded to a sublane multiple (513 -> 520)
        in_channels = self.coords_dim + self.feats_dim
        block_init_scale = self.init_scale * math.sqrt(1.0 / self.width)

        x = jnp.concatenate([coords, feats], axis=1)  # [N, C, P]
        # All Dense layers run on 2D flattened tokens [N*S, W]: XLA emits the
        # [B, S, K]x[K, N] 3D dot via a batch-in-sublanes convolution at ~57%
        # MXU utilization, while the identical [B*S, K]x[K, N] 2D dot hits
        # ~98% (measured on v5e: 1.21 ms vs 0.72 ms for the MLP up-proj).
        # The sequence is padded to a multiple of 8 so rows align with the
        # (8, 128) tile grid and every [N*S, W] <-> [N, S, W] reshape is a
        # free bitcast (with S=513 the tiled 3D layout pads each batch's
        # sublanes, making the flatten a real 25 ms/step HBM copy). Pad
        # tokens are zero-filled, masked out of the attention softmax
        # (valid_len), and sliced off before the output projection — their
        # cotangents are exactly zero, so both activations and weight
        # gradients for real tokens are bit-identical to the unpadded model.
        h = jnp.transpose(x, (0, 2, 1)).astype(self.dtype).reshape(n * p, in_channels)
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
            tp=self.tp,
            tp_axis=self.tp_axis,
            name="time_embed",
        )(timestep_embedding(t, self.width).astype(self.dtype))  # [N, width]

        parts = [t_embed[:, None, :], h.reshape(n, p, self.width)]
        if seq != valid:
            parts.append(jnp.zeros((n, seq - valid, self.width), self.dtype))
        h = jnp.concatenate(parts, axis=1)  # [N, seq, width]
        h = h.reshape(n * seq, self.width)

        h = FusedLayerNorm(name="ln_pre")(h)
        h = h.astype(self.dtype)
        if self.remat:
            policy = None
            if self.remat_policy == "dots":
                policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            block_cls = nn.remat(ResidualAttentionBlock, policy=policy)
        else:
            block_cls = ResidualAttentionBlock
        # "auto": tanh-GELU when compute is bf16 (sub-ulp at storage
        # precision, ~2x faster c_fc fusions), reference-exact erf otherwise.
        # time_embed above stays erf either way: it runs once per step on
        # [N, width] (no measurable cost) and feeds every block.
        gelu = self.gelu
        if gelu == "auto":
            gelu = "tanh" if self.dtype == jnp.bfloat16 else "erf"
        pending = None
        for i in range(self.layers):
            h, pending = block_cls(
                width=self.width,
                heads=self.heads,
                init_scale=block_init_scale,
                seq=seq,
                valid_len=valid,
                dtype=self.dtype,
                attn_impl=self.attn_impl,
                qkv_groups=qkv_groups,
                gelu=gelu,
                tp=self.tp,
                tp_axis=self.tp_axis,
                name=f"resblocks_{i}",
            )(h, pending)
        _, h = FusedLayerNorm(name="ln_post")(h, pending)
        # project all seq tokens (extra rows are ~0.2% flops), then slice the
        # narrow [N, seq, C] result — slicing the wide [N, seq, W] tensor
        # before the projection would be a full-size HBM copy
        h = nn.Dense(
            in_channels,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=jnp.float32,
            name="output_proj",
        )(h.astype(jnp.float32))
        h = h.reshape(n, seq, in_channels)[:, 1:valid]  # drop time + pad tokens
        pred = jnp.transpose(h, (0, 2, 1))  # [N, C, P]
        return pred[:, : self.coords_dim], pred[:, self.coords_dim:]
