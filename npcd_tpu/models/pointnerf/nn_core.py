"""Minimal functional MLP + positional-encoding primitives.

The PointNeRF compute path uses hand-rolled functional MLPs (explicit param
pytrees) rather than flax modules: the render pipeline threads them through
lax.map/scan chunking and jax.checkpoint rematerialization, which is simpler
and more transparent without module plumbing. Semantics mirror the
reference's define_mlp (npcd/utils/model.py:22-36: Linear+activation stacks,
torch-default uniform init) and PositionalEncoder1D
(npcd/utils/positional_encoder.py:7-23).
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp


def _linear_init(rng, d_in: int, d_out: int):
    """torch.nn.Linear default init: U(+-1/sqrt(d_in)) for both w and b."""
    bound = 1.0 / math.sqrt(d_in)
    k_w, k_b = jax.random.split(rng)
    w = jax.random.uniform(k_w, (d_in, d_out), jnp.float32, -bound, bound)
    b = jax.random.uniform(k_b, (d_out,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def init_mlp(
    rng,
    dims: Sequence[int],
    d_in: int,
    d_out: Optional[int] = None,
) -> List[Dict[str, jnp.ndarray]]:
    """Hidden layers `dims` each followed by the activation, plus an optional
    final linear projection to d_out (no activation)."""
    layers = []
    cur = d_in
    for dim in dims:
        rng, k = jax.random.split(rng)
        layers.append(_linear_init(k, cur, dim))
        cur = dim
    if d_out is not None:
        rng, k = jax.random.split(rng)
        layers.append(_linear_init(k, cur, d_out))
    return layers


def apply_mlp(
    layers: List[Dict[str, jnp.ndarray]],
    x: jnp.ndarray,
    act: str = "leaky_relu",
    final_linear: bool = True,
    compute_dtype: Any = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Apply an init_mlp stack; activation after every layer except the last
    when final_linear (matching define_mlp's trailing Linear).

    impl='auto' dispatches large leaky-relu stacks on TPU to the fused
    Pallas kernel (ops/pallas/fused_mlp.py), which keeps every intermediate
    activation in VMEM — XLA materializes each [M, width] layer output in
    HBM, the dominant traffic of the stage-1 train step."""
    if act == "leaky_relu":
        # max(x, 0.01x) == leaky_relu(x) exactly, but fuses as pure
        # arithmetic: jax.nn.leaky_relu's where() made XLA materialize
        # [*, 256] u8 predicate tensors (~50 ms/render in the eval path)
        act_fn = lambda h: jnp.maximum(h, 0.01 * h)
    elif act == "relu":
        act_fn = jax.nn.relu
    else:
        raise ValueError(act)

    n = len(layers)
    h = x if compute_dtype is None else x.astype(compute_dtype)

    if impl == "auto":
        rows = 1
        for d in h.shape[:-1]:
            rows *= d
        impl = (
            "pallas"
            if (
                jax.default_backend() == "tpu"
                and act == "leaky_relu"
                and final_linear
                and rows >= 4096
                and max(max(l["w"].shape) for l in layers) <= 512
                # bf16 only: at f32 the XLA pipeline overlaps better
                # (measured 143k vs 116k eval rays/s)
                and h.dtype == jnp.bfloat16
            )
            else "xla"
        )
    if impl == "pallas":
        from ...ops.pallas.fused_mlp import fused_mlp

        weights = []
        for layer in layers:
            w, b = layer["w"], layer["b"]
            if compute_dtype is not None:
                w, b = w.astype(compute_dtype), b.astype(compute_dtype)
            weights.append((w, b))
        h3 = h if h.ndim == 3 else h.reshape(1, -1, h.shape[-1])
        out = fused_mlp(h3, tuple(weights), final_linear)
        return out.reshape(*h.shape[:-1], out.shape[-1])

    for i, layer in enumerate(layers):
        w, b = layer["w"], layer["b"]
        if compute_dtype is not None:
            w, b = w.astype(compute_dtype), b.astype(compute_dtype)
        # f32 accumulation on the MXU regardless of the storage dtype
        h = (
            jnp.dot(h, w, preferred_element_type=jnp.float32).astype(w.dtype) + b
        )
        if not (final_linear and i == n - 1):
            h = act_fn(h)
    return h


def positional_encoding(
    x: jnp.ndarray, n_freqs: int, freq_mult: float = 1.0, method: str = "recurrence"
) -> jnp.ndarray:
    """[..., d] -> [..., d*(1+2*n_freqs)].

    Per input dim: [x, sin(2^0 pi x) .. sin(2^{n-1} pi x),
    cos(2^0 pi x) .. cos(2^{n-1} pi x)], matching the reference layout
    (sin block then cos block, flattened per input dim).

    method='recurrence' evaluates only sin/cos of the base frequency and
    derives the octaves with the exact double-angle identities
    (s' = 2sc, c' = 2c^2 - 1) — 2 transcendentals per input element instead
    of 2*n_freqs, a large VPU saving in the aggregation hot loop, but the
    phase error doubles per octave (up to ~7e-3 at octave 9).
    method='anchored' re-anchors the recurrence with direct sin/cos every
    5 octaves: 4 transcendentals per element, error compounds over at most
    4 doublings (measured max |dev| from 'direct' 1.2e-5 over 200k inputs
    in [-2, 2], n_freqs 6 and 10 — far below one bf16 ulp, so bf16-compute
    paths see reference-exact inputs; tests/test_renderer.py pins the
    bound at atol=2e-5). method='direct' matches the reference op-for-op.
    """
    if method == "direct":
        freq_bands = freq_mult * (2.0 ** jnp.arange(n_freqs, dtype=jnp.float32)) * jnp.pi
        spectrum = x[..., None] * freq_bands  # [..., d, n]
        enc = jnp.concatenate([jnp.sin(spectrum), jnp.cos(spectrum)], axis=-1)
    else:
        anchor_every = 5 if method == "anchored" else n_freqs
        xf = x.astype(jnp.float32)
        sins, coss = [], []
        for g0 in range(0, n_freqs, anchor_every):
            # 2^g0 * (fm*pi) is a power-of-2 scaling of the same f32
            # constant, so the anchor's argument is bitwise the doubled
            # base — anchors and 'direct' agree exactly at octave g0
            base = (freq_mult * float(2 ** g0) * jnp.pi) * xf
            s, c = jnp.sin(base), jnp.cos(base)
            sins.append(s)
            coss.append(c)
            for _ in range(min(anchor_every, n_freqs - g0) - 1):
                s, c = 2.0 * s * c, 2.0 * c * c - 1.0
                sins.append(s)
                coss.append(c)
        enc = jnp.stack(sins + coss, axis=-1).astype(x.dtype)  # [..., d, 2n]
    enc = enc.reshape(*x.shape[:-1], x.shape[-1] * 2 * n_freqs)
    return jnp.concatenate([x, enc], axis=-1)


def posenc_dim(d_in: int, n_freqs: int) -> int:
    return d_in * (1 + 2 * n_freqs)
