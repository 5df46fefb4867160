"""Stage-1 evaluation: render every view of every object, report PSNR.

Rebuild of the reference PointNeRFEvaluation
(npcd/eval/pointnerf_evaluation.py): evaluates the autodecoder on its own
training scenes (it is an autodecoder — reference eval_pointnerf.py:53),
rendering each object's views at full resolution in eval mode, computing
per-view PSNR, and aggregating into a pandas frame written as csv/pickle.
Runtime measurement brackets the jitted render with block_until_ready
(the TPU analogue of the reference's cuda.synchronize protocol,
pointnerf_evaluation.py:215-234) and is reported after 3 burn-in samples.
"""
from __future__ import annotations

import os
import os.path as osp
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..utils import logging, writer
from ..utils.util import psnr


class PointNeRFEvaluation:
    def __init__(
        self,
        out_dir: Optional[str] = None,
        eval_batch_size: int = 1,
        verbose: bool = True,
        mesh=None,
    ):
        """``mesh`` (a 1-D ('data',) jax.sharding.Mesh) shards each render
        call's view batch over the axis (params replicated) — PSNR eval is
        ~117k full-resolution renders for SRN-Cars, embarrassingly view-
        parallel. View chunks not divisible by the device count fall back
        to unsharded calls, and the per-forward runtime protocol
        (eval_batch_size=1, reference pointnerf_evaluation.py:222-232)
        remains a single-device measurement by construction."""
        self.out_dir = out_dir
        self.eval_batch_size = eval_batch_size
        self.verbose = verbose
        self.burn_in_samples = 3
        self.mesh = mesh

    def __call__(
        self,
        dataset,
        model,
        params,
        samples: Optional[int] = None,
        sample_indices: Optional[list] = None,
        qualitatives: int = 10,
        resolution: int = 128,
    ) -> pd.DataFrame:
        if self.out_dir is not None:
            os.makedirs(self.out_dir, exist_ok=True)
            results_path = osp.join(self.out_dir, "results.pickle")
            if osp.exists(results_path):  # idempotent (reference :94-97)
                logging.info(f"Evaluation results exist at {results_path}; skipping.")
                return pd.read_pickle(results_path)

        if sample_indices is not None:
            indices = list(sample_indices)
        else:
            indices = list(range(len(dataset)))
            if samples is not None and samples < len(indices):
                indices = list(
                    np.linspace(0, len(indices) - 1, samples).astype(int)
                )

        @jax.jit
        def render_views(p, obj_idx, intr, extr):
            pred, _ = model.forward(p, obj_idx, intr, extr, train=False,
                                    resolution=resolution)
            return pred["channels"]

        view_shard = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            params = jax.device_put(
                params, NamedSharding(self.mesh, PartitionSpec()))
            # cameras shard on the view dim (dim 1 of [1, V, ...])
            view_shard = NamedSharding(self.mesh, PartitionSpec(None, "data"))

        rows = []
        times = []
        for n, idx in enumerate(indices):
            sample = dataset[idx]
            obj_idx = jnp.asarray([sample["obj_idx"]])
            extr = jnp.asarray(sample["extrinsics"])[None]  # [1, V, 4, 4]
            intr = jnp.asarray(sample["intrinsics"])[None]
            gt = np.asarray(sample["images"])  # [V, H*W, 3]
            num_views = extr.shape[1]

            view_chunks = range(0, num_views, self.eval_batch_size)
            channels = []
            for start in view_chunks:
                sl = slice(start, start + self.eval_batch_size)
                intr_c, extr_c = intr[:, sl], extr[:, sl]
                if (view_shard is not None
                        and intr_c.shape[1] % self.mesh.devices.size == 0):
                    intr_c = jax.device_put(intr_c, view_shard)
                    extr_c = jax.device_put(extr_c, view_shard)
                t0 = time.time()
                out = render_views(params, obj_idx, intr_c, extr_c)
                out = jax.block_until_ready(out)
                dt = time.time() - t0
                if n >= self.burn_in_samples and self.eval_batch_size == 1:
                    times.append(dt)
                channels.append(np.asarray(out[0]))
            channels = np.concatenate(channels, 0)  # [V, H*W, 3]

            for v in range(num_views):
                rows.append(
                    {
                        "obj_idx": int(sample["obj_idx"]),
                        "view": int(sample["view_indices"][v]) if "view_indices" in sample else v,
                        "psnr": psnr(channels[v], gt[v]),
                    }
                )
            if self.verbose and (n % 50 == 0 or n == len(indices) - 1):
                logging.info(
                    f"eval {n + 1}/{len(indices)}: running PSNR "
                    f"{np.mean([r['psnr'] for r in rows]):.3f}"
                )
            if self.out_dir is not None and n < qualitatives:
                self._save_qualitative(channels, gt, resolution, idx)

        df = pd.DataFrame(rows)
        summary = {"psnr": float(df["psnr"].mean())}
        if times:
            summary["time_per_forward_s"] = float(np.mean(times))
            # TPU analogue of the reference's peak-GPU-memory report
            # (pointnerf_evaluation.py:222-232)
            from ..utils.profiling import device_memory_stats

            mem = device_memory_stats()
            if "peak_bytes_in_use" in mem:
                summary["peak_device_mem_mib"] = mem["peak_bytes_in_use"] / 2**20
        logging.info(f"PointNeRF evaluation: {summary}")

        if self.out_dir is not None:
            df.to_pickle(osp.join(self.out_dir, "results.pickle"))
            df.to_csv(osp.join(self.out_dir, "results.csv"))
            pd.DataFrame([summary]).to_csv(osp.join(self.out_dir, "summary.csv"))
        return df

    def _save_qualitative(self, channels, gt, resolution, idx):
        try:
            from ..utils.vis import vis_image

            pred = channels[0].reshape(resolution, resolution, 3)
            gt_img = gt[0].reshape(resolution, resolution, 3)
            img = vis_image(
                np.stack([pred, gt_img]), full_batch=True,
                batch_labels=["pred", "gt"], text_off=False,
            )
            img.save(osp.join(self.out_dir, f"qualitative_{idx:05d}.png"))
        except Exception as e:  # qualitative output is best-effort
            logging.warning(f"qualitative save failed: {e}")
