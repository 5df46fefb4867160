"""Micro-benchmark TPU costs of sample-packing primitives for eval render.

Decides the packed-sample eval render design: is a full argsort over the
[I, R*M] slot grid affordable, or do we need the prefix-sum/scatter route?

Usage: python tools/pack_primitives_ab.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.tputime import compare

I, R, M = 32, 16384, 50
RM = R * M
B = RM // 4

key = jax.random.PRNGKey(0)
mask = jax.random.uniform(key, (I, RM)) < 0.26
idx_small = jax.random.randint(key, (I, B), 0, RM)
idx_big = jax.random.randint(key, (I, RM), 0, B)
tab_rows4 = jax.random.normal(key, (I, RM, 4))
tab_flat = jax.random.normal(key, (I, B))
starts = jnp.sort(jax.random.randint(key, (I, R), 0, B), axis=1)
vals_b = jax.random.normal(key, (I, B))
prefix = jnp.cumsum(jnp.sum(mask.reshape(I, R, M), -1), axis=1)


def argsort_big(m):
    key_ = jnp.where(m, jnp.arange(RM, dtype=jnp.int32)[None], jnp.int32(RM))
    return jnp.argsort(key_, axis=1)


def gather_rows_small(tab, idx):
    # pack: B row-gathers of width-4 rows from the dense grid
    return jnp.take_along_axis(tab, idx[..., None], axis=1)


def gather_flat_big(tab, idx):
    # unpack: R*M element-gathers from the packed buffer
    return jnp.take_along_axis(tab, idx, axis=1)


def gather_slices_m(tab, st):
    # unpack via contiguous M-slices at per-ray starts
    pos = jnp.clip(st[:, :, None] + jnp.arange(M)[None, None, :], 0, B - 1)
    return jnp.take_along_axis(tab, pos.reshape(I, R * M), axis=1)


def scatter_ones(st):
    z = jnp.zeros((I, B), jnp.float32)
    return z.at[jnp.arange(I)[:, None], jnp.clip(st, 0, B - 1)].add(1.0)


def cumsum_b(v):
    return jnp.cumsum(v, axis=1)


def searchsorted_b(pfx, q):
    f = jax.vmap(lambda p, qq: jnp.searchsorted(p, qq, side="right"))
    return f(pfx, q)


def onehot_pack(tab, idx):
    # one-hot MXU gather at eval scale (expected to be terrible: B x RM dot)
    oh = jax.nn.one_hot(idx[:, :4096], RM, dtype=jnp.bfloat16)
    return jnp.einsum("ibr,irc->ibc", oh, tab.astype(jnp.bfloat16))


q_b = jax.random.randint(key, (I, B), 0, RM // M)

compare({
    "argsort_32x819200": (argsort_big, (mask,)),
    "gather_rows4_32x204800": (gather_rows_small, (tab_rows4, idx_small)),
    "gather_flat_32x819200_fromB": (gather_flat_big, (tab_flat, idx_big)),
    "gather_Mslices_32x16384x50": (gather_slices_m, (tab_flat, starts)),
    "scatter_ones_32x16384_toB": (scatter_ones, (starts,)),
    "cumsum_32x204800": (cumsum_b, (vals_b,)),
    "searchsorted_32x204800_in16k": (searchsorted_b, (prefix, q_b)),
}, iters=5)
