#!/usr/bin/env python
"""Measure the FID protocol's Inception feature-extraction phase.

The reference feeds all 251,000 rendered images through the StyleGAN
TorchScript InceptionV3 (reference npcd/utils/fidkid.py:30-34,
npcd/eval/diffusion_evaluation.py:179-181). That phase previously had no
perf existence in this repo's wall-clock accounting (bench.py estimated
render + sampler only). This tool measures both extraction paths:

  * torch_cpu — a TorchScript stand-in of the SAME architecture
    (InceptionV3, 94 conv-bn blocks, 2048 pool features; built from a
    random-weight tf-keras InceptionV3 so the graph exists without the
    absent inception-2015-12-05.pt asset), traced and run the way
    utils/fidkid.py TorchScriptInceptionExtractor runs the real graph:
    [0,1] 128^2 images -> bilinear resize to 299 -> forward, batch 32,
    CPU threads as found. Throughput (not features) is the question, and
    throughput depends on architecture + backend, not weight values.
  * jax_tpu — utils/inception_jax.JaxInceptionExtractor with the same
    random weights, batch 64, on the default JAX backend (TPU here): the
    TPU-native path that keeps the whole generate->render->score loop on
    device.

Writes docs/experiments/fid_extract.json; bench.py merges these numbers
into diffusion_eval_est_hours (extraction overlapped with rendering via
eval/diffusion_evaluation.py's extractor worker thread — the estimate uses
max(render, extract) + sampler for the overlapped torch path).

Usage: python tools/ab_fid_extract.py [--images 96] [--out docs/experiments/fid_extract.json]
"""
from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def build_keras_params(seed: int = 0):
    """Random-weight InceptionV3 params in the (kernel, beta, mean, var)
    list layout shared by inception_jax and the torch stand-in."""
    from tf_keras.applications import InceptionV3

    from npcd_tpu.utils.inception_jax import params_from_keras_model

    model = InceptionV3(weights=None, include_top=False, pooling="avg")
    return params_from_keras_model(model)


def build_torch_standin(params):
    """TorchScript module mirroring inception_jax.inception_v3_features —
    the same conv/pool/concat flow over the same 94 conv-bn tuples, NCHW.
    Architecture-faithful stand-in for the absent TorchScript asset."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class ConvBN(nn.Module):
        def __init__(self, p, stride, padding):
            super().__init__()
            kernel, beta, mean, var = p
            kh, kw, ci, co = kernel.shape
            pad = (kh // 2, kw // 2) if padding == "SAME" else 0
            self.conv = nn.Conv2d(ci, co, (kh, kw), stride, pad, bias=False)
            with torch.no_grad():
                self.conv.weight.copy_(
                    torch.from_numpy(kernel.transpose(3, 2, 0, 1))
                )
            rstd = 1.0 / np.sqrt(var + 1e-3)
            self.register_buffer(
                "scale", torch.from_numpy((rstd).astype(np.float32))[None, :, None, None]
            )
            self.register_buffer(
                "shift",
                torch.from_numpy((beta - mean * rstd).astype(np.float32))[
                    None, :, None, None
                ],
            )

        def forward(self, x):
            return F.relu(self.conv(x) * self.scale + self.shift)

    class Standin(nn.Module):
        def __init__(self, params):
            super().__init__()
            self.blocks = nn.ModuleList()
            self._it = 0
            # instantiate in the exact jax call order; forward replays it
            specs = []

            def plan(stride=1, padding="SAME"):
                specs.append((stride, padding))

            # stem
            plan(2, "VALID"); plan(1, "VALID"); plan()
            plan(1, "VALID"); plan(1, "VALID")
            # mixed 0-2: 1 + 2 + 3 + 1 convs each
            for _ in range(3):
                for _ in range(7):
                    plan()
            # mixed 3
            plan(2, "VALID"); plan(); plan(); plan(2, "VALID")
            # mixed 4-7: 1 + 3 + 5 + 1
            for _ in range(4):
                for _ in range(10):
                    plan()
            # mixed 8
            plan(); plan(2, "VALID"); plan(); plan(); plan(); plan(2, "VALID")
            # mixed 9-10: 1 + 1+2 + 2+2 + 1
            for _ in range(2):
                for _ in range(9):
                    plan()
            assert len(specs) == len(params), (len(specs), len(params))
            for p, (stride, padding) in zip(params, specs):
                self.blocks.append(ConvBN(p, stride, padding))

        def forward(self, x):
            it = iter(self.blocks)
            nxt = lambda: next(it)
            mp = lambda x: F.max_pool2d(x, 3, 2)
            ap = lambda x: F.avg_pool2d(x, 3, 1, 1, count_include_pad=False)
            cat = lambda ts: torch.cat(ts, dim=1)

            x = nxt()(x); x = nxt()(x); x = nxt()(x)
            x = mp(x)
            x = nxt()(x); x = nxt()(x)
            x = mp(x)
            for _ in range(3):
                b1 = nxt()(x)
                b5 = nxt()(x); b5 = nxt()(b5)
                b3 = nxt()(x); b3 = nxt()(b3); b3 = nxt()(b3)
                bp = nxt()(ap(x))
                x = cat([b1, b5, b3, bp])
            b3 = nxt()(x)
            b3d = nxt()(x); b3d = nxt()(b3d); b3d = nxt()(b3d)
            x = cat([b3, b3d, mp(x)])
            for _ in range(4):
                b1 = nxt()(x)
                b7 = nxt()(x); b7 = nxt()(b7); b7 = nxt()(b7)
                b7d = x
                for _ in range(5):
                    b7d = nxt()(b7d)
                bp = nxt()(ap(x))
                x = cat([b1, b7, b7d, bp])
            b3 = nxt()(x); b3 = nxt()(b3)
            b7 = nxt()(x); b7 = nxt()(b7); b7 = nxt()(b7); b7 = nxt()(b7)
            x = cat([b3, b7, mp(x)])
            for _ in range(2):
                b1 = nxt()(x)
                b3 = nxt()(x)
                b3 = cat([nxt()(b3), nxt()(b3)])
                b3d = nxt()(x); b3d = nxt()(b3d)
                b3d = cat([nxt()(b3d), nxt()(b3d)])
                bp = nxt()(ap(x))
                x = cat([b1, b3, b3d, bp])
            return x.mean(dim=(2, 3))

    return Standin(params).eval()


def measure_torch(params, images, batch_size=32, warmup=1, rounds=3):
    """imgs/s of the traced stand-in, run like the production TorchScript
    extractor (resize 299 + normalize inside the timed region)."""
    import torch

    model = build_torch_standin(params)
    ex = torch.from_numpy(
        np.zeros((batch_size, 3, 299, 299), np.float32)
    )
    with torch.no_grad():
        traced = torch.jit.trace(model, ex)
        traced = torch.jit.freeze(traced)

        def run_batch(chunk):
            x = torch.from_numpy(
                (chunk * 2.0 - 1.0).transpose(0, 3, 1, 2).astype(np.float32)
            )
            x = torch.nn.functional.interpolate(
                x, (299, 299), mode="bilinear", align_corners=False
            )
            return traced(x).numpy()

        for _ in range(warmup):
            run_batch(images[:batch_size])
        n = 0
        t0 = time.perf_counter()
        for _ in range(rounds):
            for i in range(0, len(images), batch_size):
                chunk = images[i : i + batch_size]
                if len(chunk) < batch_size:
                    break
                run_batch(chunk)
                n += len(chunk)
        dt = time.perf_counter() - t0
    return n / dt, dt


def measure_jax(params, images, batch_size=64, warmup=1, rounds=3,
                device_input=False):
    """device_input=True measures the production eval-pipeline path since
    r05: renders already on device feed the extractor directly (no
    host->device hop per batch — over a tunneled device that hop was the
    measured ceiling; features are bit-identical either way)."""
    from npcd_tpu.utils.inception_jax import JaxInceptionExtractor

    import jax
    import jax.numpy as jnp

    extractor = JaxInceptionExtractor(params, batch_size=batch_size)
    feed = jnp.asarray(images) if device_input else images
    for _ in range(warmup):
        extractor(feed[:batch_size])
    n = 0
    t0 = time.perf_counter()
    for _ in range(rounds):
        feats = extractor(feed)
        n += len(images)
    dt = time.perf_counter() - t0
    return n / dt, dt, jax.default_backend()


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--images", type=int, default=96)
    p.add_argument("--res", type=int, default=128)
    p.add_argument("--torch-batch", type=int, default=32)
    p.add_argument("--jax-batch", type=int, default=64)
    p.add_argument("--skip-torch", action="store_true")
    p.add_argument("--skip-jax", action="store_true")
    p.add_argument("--out", default="docs/experiments/fid_extract.json")
    args = p.parse_args(argv)

    rng = np.random.default_rng(0)
    images = rng.uniform(0, 1, (args.images, args.res, args.res, 3)).astype(
        np.float32
    )
    print("building random-weight InceptionV3 params (tf-keras)...", flush=True)
    params = build_keras_params()

    out = {
        "arch": "inception_v3_standin_random_weights",
        "n_conv_bn": len(params),
        "image_res": args.res,
        "protocol_images": 251000,  # 1000 objects x 251 poses
    }
    if not args.skip_torch:
        import torch

        ips, dt = measure_torch(params, images, args.torch_batch)
        out["torch_cpu"] = {
            "imgs_per_s": round(ips, 2),
            "batch_size": args.torch_batch,
            "threads": torch.get_num_threads(),
            "est_hours_251k": round(251000 / ips / 3600, 2),
        }
        print(
            f"torch CPU (TorchScript stand-in, {torch.get_num_threads()} "
            f"threads): {ips:.2f} imgs/s -> "
            f"{out['torch_cpu']['est_hours_251k']} h for 251k",
            flush=True,
        )
    if not args.skip_jax:
        # device_input is the production eval-pipeline path since r05
        # (device-resident renders feed the extractor directly)
        ips, dt, backend = measure_jax(params, images, args.jax_batch,
                                       device_input=True)
        ips_host, _, _ = measure_jax(params, images, args.jax_batch)
        out["jax"] = {
            "imgs_per_s": round(ips, 2),
            "imgs_per_s_host_fed": round(ips_host, 2),
            "batch_size": args.jax_batch,
            "backend": backend,
            "est_hours_251k": round(251000 / ips / 3600, 3),
        }
        print(
            f"jax [{backend}] (inception_jax): {ips:.2f} imgs/s "
            f"device-fed ({ips_host:.2f} host-fed) -> "
            f"{out['jax']['est_hours_251k']} h for 251k",
            flush=True,
        )

    os.makedirs(osp.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
