"""A/B: budget pack/expand gather formulations at SRN stage-1 production
shapes (I=400 instances, dense grid R*M=14336 slots, budget cap=1792).

Candidates per direction (fwd+bwd measured via jax.grad through the
gather, matching how the train step differentiates them):

  pack   [I, 14336, 6] -> [I, 1792, 6]   (gather_rows via sel)
  expand [I, 1792, 5]  -> [I, 14336, 5]  (gather_rows via rank, clamped)

  onehot : the production one-hot-MXU custom-vjp (aggregator.gather_rows)
  take   : jnp.take_along_axis (XLA native gather; bwd is a scatter-add)

Usage: python tools/ab_gather.py
"""
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

import jax
import jax.numpy as jnp

from npcd_tpu.models.pointnerf.aggregator import gather_rows
from tputime import device_time

I, NM, CAP = 400, 14336, 1792


def take_rows(table, idx):
    return jnp.take_along_axis(
        table, idx[..., None].astype(jnp.int32), axis=1)


def main():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    table_pack = jax.random.normal(k1, (I, NM, 6), jnp.float32)
    packed = jax.random.normal(k2, (I, CAP, 5), jnp.float32)
    # a realistic rank: a permutation of [0, NM) per instance (values >= CAP
    # are clamped + masked in the caller; the gather itself sees min(rank,
    # CAP-1))
    rank = jax.vmap(lambda k: jax.random.permutation(k, NM))(
        jax.random.split(k3, I))
    sel = jnp.argsort(rank, axis=1)[:, :CAP]
    rank_c = jnp.minimum(rank, CAP - 1)

    for name, fn, args in [
        ("pack_onehot", lambda t, s: gather_rows(t, s).sum(), (table_pack, sel)),
        ("pack_take", lambda t, s: take_rows(t, s).sum(), (table_pack, sel)),
        ("expand_onehot", lambda p, r: gather_rows(p, r).sum(), (packed, rank_c)),
        ("expand_take", lambda p, r: take_rows(p, r).sum(), (packed, rank_c)),
    ]:
        g = jax.jit(jax.grad(fn, argnums=0))
        f = jax.jit(fn)
        tf = device_time(name + "_fwd", f, args, iters=10)
        tg = device_time(name + "_fwdbwd", g, args, iters=10)
        print(f"RESULT {name}: fwd={tf*1e3:.2f}ms fwd+bwd={tg*1e3:.2f}ms",
              flush=True)


if __name__ == "__main__":
    main()
