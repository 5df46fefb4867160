"""A/B: posenc-fused wsum kernel pair-block size (fwd and bwd caps) at the
SRN stage-1 production shapes (b=400, m=14336 pairs, k=8, 5x256 MLP).

The caps are read at import (fused_mlp._BLK_FWD/_BLK_BWD env overrides),
so each config runs in a subprocess. Usage:

  python tools/ab_blk.py                # sweep
  python tools/ab_blk.py --one 3584 1024  # single config (used internally)
"""
import os
import os.path as osp
import subprocess
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
sys.path.insert(0, osp.dirname(osp.abspath(__file__)))


def run_one(fwd_blk: int, bwd_blk: int):
    import jax
    import jax.numpy as jnp

    from npcd_tpu.ops.pallas.fused_mlp import fused_mlp_posenc_wsum
    from tputime import device_time

    B, N, K, F, NF, D = 400, 1792, 8, 32, 10, 256
    M = N * K
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    feat_t = jax.random.normal(key, (B, F, M), dt)
    x = jax.random.normal(key, (B, 3, M)) * 0.05
    w = jax.nn.softmax(jax.random.normal(key, (B, N, K)), axis=-1)
    d_in = F + 3 * (1 + 2 * NF)
    ws, din = [], d_in
    for dout in (256,) * 5:
        ws.append((jax.random.normal(key, (din, dout), dt) * 0.05,
                   jnp.zeros((dout,), dt)))
        din = dout
    ws = tuple(ws)
    ct = jax.random.normal(key, (B, N, D), dt)
    pos_t = jnp.concatenate(
        [x, w.reshape(B, 1, M), jnp.zeros((B, 4, M), x.dtype)], axis=1)

    def fwd(feat_t, pos_t, ws):
        return fused_mlp_posenc_wsum(feat_t, pos_t, ws, K, NF, 1.0, True,
                                     "recurrence", need_dw=False, need_dp=False).sum()

    def fwdbwd(feat_t, pos_t, ws, ct):
        out = fused_mlp_posenc_wsum(feat_t, pos_t, ws, K, NF, 1.0, True,
                                    "recurrence", need_dw=False, need_dp=False)
        return (out * ct).sum()

    t_f = device_time("fwd", jax.jit(fwd), (feat_t, pos_t, ws), iters=10)
    g = jax.grad(fwdbwd, argnums=(0, 2))
    t_fb = device_time("fwdbwd", g, (feat_t, pos_t, ws, ct), iters=10)
    v = float(jax.jit(fwd)(feat_t, pos_t, ws))
    print(f"RESULT fwd_blk={fwd_blk} bwd_blk={bwd_blk} "
          f"fwd={t_f*1e3:.2f}ms fwd+bwd={t_fb*1e3:.2f}ms loss={v:.4f}",
          flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        run_one(int(sys.argv[2]), int(sys.argv[3]))
        return
    fwd_caps = [1024, 2048, 3584, 7168]
    bwd_caps = [1024]
    extra_bwd = [2048]
    configs = [(f, 1024) for f in fwd_caps] + [(1024, b) for b in extra_bwd]
    for f, b in configs:
        env = dict(os.environ, NPCD_FUSED_MLP_BLK_FWD=str(f),
                   NPCD_FUSED_MLP_BLK_BWD=str(b))
        r = subprocess.run([sys.executable, osp.abspath(__file__),
                            "--one", str(f), str(b)],
                           env=env, capture_output=True, text=True,
                           timeout=900)
        for line in r.stdout.splitlines():
            if line.startswith("RESULT"):
                print(line, flush=True)
        if r.returncode != 0:
            tail = (r.stderr or "").strip().splitlines()[-3:]
            print(f"FAILED fwd={f} bwd={b}: {' | '.join(tail)}", flush=True)


if __name__ == "__main__":
    main()
