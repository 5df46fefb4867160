"""A/B: external-einsum aggregation MLP vs the in-kernel weighted
k-reduction (fused_mlp_posenc_wsum) at the SRN stage-1 geometry.

Measured v5e (2026-08-19, device time via tools/tputime):
  old (fused_mlp_posenc + einsum) 58.9 ms  ->  wsum 53.4 ms fwd+bwd
  (need_dw=False; the dw reduce costs +3.6 ms and is structurally dead
  in the production model, see aggregator.py)."""
import sys, os.path as osp
sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
import jax, jax.numpy as jnp
from npcd_tpu.ops.pallas.fused_mlp import fused_mlp_posenc, fused_mlp_posenc_wsum

B, N, K, F, NF = 400, 1792, 8, 32, 10
M = N * K
D = 256
dt = jnp.bfloat16
key = jax.random.PRNGKey(0)
feat_t = jax.random.normal(key, (B, F, M), dt)
x = jax.random.normal(key, (B, 3, M)) * 0.05
w = jax.nn.softmax(jax.random.normal(key, (B, N, K)), axis=-1)
d_in = F + 3 * (1 + 2 * NF)
import numpy as np
ws = []
din = d_in
for dout in (256, 256, 256, 256, 256):
    ws.append((jax.random.normal(key, (din, dout), dt) * 0.05,
               jnp.zeros((dout,), dt)))
    din = dout
ws = tuple(ws)
ct = jax.random.normal(key, (B, N, D), dt)

def run_old(feat_t, x, w, ws, ct):
    pos_t = jnp.pad(x, ((0, 0), (0, 5), (0, 0)))
    lf = fused_mlp_posenc(feat_t, pos_t, ws, NF, 1.0, True,
                          "recurrence").reshape(B, N, K, D)
    out = jnp.einsum("bnk,bnkc->bnc", w.astype(lf.dtype), lf)
    return (out * ct).sum()

def run_new(feat_t, x, w, ws, ct):
    pos_t = jnp.concatenate(
        [x, w.reshape(B, 1, M), jnp.zeros((B, 4, M), x.dtype)], axis=1)
    out = fused_mlp_posenc_wsum(feat_t, pos_t, ws, K, NF, 1.0, True,
                                "recurrence", need_dw=False)
    return (out * ct).sum()

from tputime import device_time
for name, fn in (("old", run_old), ("new", run_new)):
    g = jax.grad(fn, argnums=(0, 3))
    dt_s = device_time(name, g, (feat_t, x, w, ws, ct), iters=10)
    print(f"{name}: {dt_s*1e3:.2f} ms/iter (fwd+bwd, device)")
    v = jax.jit(fn)(feat_t, x, w, ws, ct)
    print(f"  loss={float(v):.4f}")
