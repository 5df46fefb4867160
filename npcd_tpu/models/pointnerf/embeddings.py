"""Per-object latent embedding tables.

Rebuild of the reference Embedding / VariationalEmbedding
(npcd/models/pointnerf/embeddings/): zero-initialized per-object tables,
the feature table storing [mean || log_var] at 2x width with
reparametrization sampling in training mode. Tables are plain arrays in the
param pytree; "freezing" is an optimizer concern (optax mask), not a module
flag. The coords table is seeded from dataset FPS point clouds and always
frozen (reference pointnerf.py:22-24).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def init_coords_table(n_obj: int, num_points: int) -> jnp.ndarray:
    return jnp.zeros((n_obj, num_points, 3), jnp.float32)


def init_variational_feats_table(n_obj: int, num_points: int, feat_dim: int) -> jnp.ndarray:
    """[n_obj, num_points, 2*feat_dim] = [mean || log_var], zero-init
    (log_var 0 => std 1)."""
    return jnp.zeros((n_obj, num_points, 2 * feat_dim), jnp.float32)


def lookup_coords(table: jnp.ndarray, obj_idx: jnp.ndarray) -> jnp.ndarray:
    """[B] -> [B, P, 3]."""
    return table[obj_idx]


def feats_mean_log_var_std(
    table: jnp.ndarray, obj_idx: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    emb = table[obj_idx]  # [B, P, 2F]
    f = emb.shape[-1] // 2
    mean, log_var = emb[..., :f], emb[..., f:]
    std = jnp.exp(0.5 * log_var)
    return mean, log_var, std


def sample_feats(
    table: jnp.ndarray,
    obj_idx: jnp.ndarray,
    rng: jax.Array | None,
    eps: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Training-mode reparametrized sample (rng given) or eval-mode mean
    (rng None). `eps` overrides the standard-normal draw with an explicit
    [B, P, F] tensor (matched-draw parity experiments, tools/ref_dynamics.py)."""
    mean, _, std = feats_mean_log_var_std(table, obj_idx)
    if rng is None and eps is None:
        return mean
    if eps is None:
        eps = jax.random.normal(rng, std.shape, std.dtype)
    return mean + std * eps
