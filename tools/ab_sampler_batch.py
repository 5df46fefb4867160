"""A/B: DDPM sampler throughput vs generation batch size (v5e-1).

The FID protocol (reference npcd/eval/diffusion_evaluation.py:144-153)
generates 1000 objects with a 1000-step DDPM reverse scan; sampling is
~0.6 h of the 2.2 h single-chip wall-clock at the measured 13.7 reverse
steps/s x batch 32. Per reverse step the denoiser fwd is ~9.9 TFLOP at
batch 32 (2 x 302M x 32 x 513 tokens) -> the step is ~68% of the bf16
MXU rate, so a larger generation batch may buy real samples/s if the
extra rows amortize the attention/VPU tails. This A/B times the exact
`p_sample` reverse scan from bench.py at several batch sizes and prints
steps/s, samples*steps/s (the FID-relevant rate), and the implied
sampling hours for 1000 objects x 1000 steps.

Usage: python tools/ab_sampler_batch.py [--batches 32,64] [--scan 30]
"""
import argparse
import math
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="32,64")
    ap.add_argument("--scan", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from npcd_tpu.models.diffusion import DiffusionModel

    model = DiffusionModel(
        coords_dim=3, width=1024, layers=24, heads=16, num_points=512,
        feats_dim=32, dtype=jnp.bfloat16, remat=False)
    dstate = model.init(jax.random.PRNGKey(0))
    proc = model.process
    p = model.num_points
    scan_len = args.scan

    @jax.jit
    def sample_scan(params, c, f, rng):
        fn = model.denoise_fn(params)

        def body(carry, t_s):
            c, f, rng = carry
            rng, r2 = jax.random.split(rng)
            t = jnp.full((c.shape[0],), t_s, jnp.int32)
            out = proc.p_sample(r2, fn, c, f, t, None, None)
            return (out.coords, out.feats, rng), None

        ts = jnp.arange(scan_len, dtype=jnp.int32)[::-1]
        (c, f, _), _ = jax.lax.scan(body, (c, f, rng), ts)
        return c, f

    results = []
    for b in [int(x) for x in args.batches.split(",")]:
        c0 = jax.random.normal(jax.random.PRNGKey(7), (b, 3, p))
        f0 = jax.random.normal(jax.random.PRNGKey(8), (b, model.feats_dim, p))
        t0 = time.perf_counter()
        c, _ = sample_scan(dstate.params, c0, f0, jax.random.PRNGKey(9))
        float(c.sum())
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        c, f = sample_scan(dstate.params, c0, f0, jax.random.PRNGKey(10))
        float(c.sum())
        dt = time.perf_counter() - t0
        steps_s = scan_len / dt
        # 1000 objects x 1000 reverse steps, batched b at a time
        n_batches = math.ceil(1000 / b)
        hours = n_batches * 1000 / steps_s / 3600
        results.append((b, steps_s, b * steps_s, hours))
        print(f"batch {b:4d}: {steps_s:6.2f} steps/s  "
              f"{b * steps_s:8.1f} sample-steps/s  "
              f"sampling(1000 obj): {hours:.3f} h  "
              f"(compile+first-run {compile_s:.0f}s)",
              flush=True)

    best = max(results, key=lambda r: r[2])
    print(f"best: batch {best[0]} at {best[2]:.1f} sample-steps/s "
          f"({best[3]:.3f} h for the protocol)")


if __name__ == "__main__":
    main()
