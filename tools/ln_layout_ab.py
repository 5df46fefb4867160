"""A/B the LayerNorm row-block grid layouts (NPCD_LN_ROWS) on the real TPU.

Production geometry: the 302M transformer's 2D token stream [16640, 1024]
viewed as [52, 320, 1024] slabs (transformer._slab_rows). Measures on-device
time of the fused residual-LN fwd and fwd+bwd per layout via
tools/tputime.device_time. Run from the repo root:

    python tools/ln_layout_ab.py
"""
import os
import sys

import os.path as osp

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, osp.join(REPO, "tools"))

import jax
import jax.numpy as jnp
from tputime import device_time

from npcd_tpu.ops.pallas import layer_norm as ln_mod

N, S, W = 52, 320, 1024
x = jax.random.normal(jax.random.PRNGKey(0), (N, S, W), jnp.bfloat16)
d = jax.random.normal(jax.random.PRNGKey(1), (N, S, W), jnp.bfloat16)
g = jnp.ones((W,), jnp.float32)
b = jnp.zeros((W,), jnp.float32)
gr = jax.random.normal(jax.random.PRNGKey(2), (N, S, W), jnp.bfloat16)


def fwd(x, d, g, b):
    r, y = ln_mod.layer_norm_residual(x, d, g, b)
    return r, y


def fwdbwd(x, d, g, b):
    def loss(x, d, g, b):
        r, y = ln_mod.layer_norm_residual(x, d, g, b)
        return ((r * gr.astype(r.dtype)).sum().astype(jnp.float32)
                + (y * gr.astype(y.dtype)).sum().astype(jnp.float32))

    return jax.grad(loss, argnums=(0, 1, 2, 3))(x, d, g, b)


print(f"backend={jax.default_backend()} device={jax.devices()[0]}")
results = {}
for rows in ["0", "128", "256", "640", "832"]:
    os.environ["NPCD_LN_ROWS"] = rows
    gl = ln_mod._grid_layout(N, S)
    try:
        tf = device_time(f"lnres_fwd_r{rows}", fwd, (x, d, g, b), iters=20)
        tb = device_time(f"lnres_fwdbwd_r{rows}", fwdbwd, (x, d, g, b), iters=20)
    except Exception as e:  # e.g. scoped-VMEM OOM at large row blocks
        print(f"rows={rows:>4} grid={gl}  FAILED: {str(e).splitlines()[0][:100]}",
              flush=True)
        continue
    results[rows] = (tf, tb)
    print(f"rows={rows:>4} grid={gl}  fwd {tf*1e6:8.1f} us   fwd+bwd {tb*1e6:8.1f} us",
          flush=True)

best = min(results, key=lambda k: results[k][1])
print(f"\nbest: NPCD_LN_ROWS={best}  (fwd+bwd {results[best][1]*1e6:.1f} us vs "
      f"default {results['0'][1]*1e6:.1f} us)")
