"""Stage-2 evaluation: generate -> render from fixed test poses -> FID/KID.

Rebuild of the reference DiffusionEvaluation
(npcd/eval/diffusion_evaluation.py): sample `num_samples` neural point
clouds, render each from the fixed test poses (251 for SRN-Cars) at 128^2,
quantize to 255 levels, and feed the images through the Inception extractor
into FID/KID against precomputed real statistics.

TPU-first differences: the sampler is one jitted lax.scan per generate
batch, and rendering batches `render_object_batch` generated objects x
`render_pose_batch` poses (G*Vb instances) through the chunked render core
per jit call instead of the reference's render_batch_size=1 one-pose-one-
object loop (diffusion_evaluation.py:24,163) — the per-pose Python loop was
the reference's biggest eval inefficiency. Inception is fed all
G*num_poses images of a render group at once (the extractor chunks
internally).

With ``mesh`` (a 1-D ('data',) jax.sharding.Mesh) the whole pipeline runs
data-parallel: generated objects shard over the axis in both the scan
sampler and the renderer (params replicated, GSPMD-inserted collectives) —
rendering is the dominant eval cost (~250k images for the SRN-Cars
protocol) and shards embarrassingly.
"""
from __future__ import annotations

import os
import os.path as osp
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..utils import logging, writer
from ..utils.fidkid import FIDKID, TorchScriptInceptionExtractor
from ..utils.util import chunks, split_num


class DiffusionEvaluation:
    def __init__(
        self,
        out_dir: Optional[str] = None,
        num_samples: int = 1000,
        poses_path: Optional[str] = None,
        intrinsics_path: Optional[str] = None,
        inception_pkl_path: Optional[str] = None,
        inception_path: Optional[str] = "data/inception-2015-12-05.pt",
        feature_extractor: Optional[Callable] = None,
        generate_batch_size: int = 16,
        render_pose_batch: int = 32,
        render_object_batch: int = 4,
        resolution: int = 128,
        poses: Optional[np.ndarray] = None,
        intrinsics: Optional[np.ndarray] = None,
        max_poses: Optional[int] = None,
        verbose: bool = True,
        mesh=None,
        render_dtype=None,
        overlap_extraction: bool = True,
    ):
        import os.path as _osp

        # Feed the (host-CPU) Inception extractor from a single worker
        # thread so feature extraction overlaps the next render group's
        # TPU work instead of serializing with it (the reference runs
        # extraction inline per feed chunk, diffusion_evaluation.py:179-181;
        # torch/np ops release the GIL, so the overlap is real). Bounded to
        # 2 in-flight groups so the image backlog stays ~400 MB.
        self.overlap_extraction = overlap_extraction
        self.out_dir = out_dir
        self.num_samples = num_samples
        self.generate_batch_size = generate_batch_size
        self.render_pose_batch = render_pose_batch
        self.render_object_batch = render_object_batch
        self.resolution = resolution
        self.verbose = verbose
        self.inception_pkl_path = inception_pkl_path
        self.mesh = mesh
        # None = the model's own render precision (f32 in the eval CLIs,
        # reference-exact). "bfloat16" runs the FID render's aggregation/
        # field MLPs in bf16 (f32 MXU accumulation), a qualified speed
        # option like the bf16 sampler (PARITY.md): the protocol quantizes
        # renders to uint8 before Inception, and the bf16/f32 renders agree
        # far above that quantization floor
        # (tests/test_eval_pipelines.py::test_fid_eval_bf16_render).
        self.render_dtype = render_dtype
        if mesh is not None:
            # data-parallel eval: objects shard over the 'data' axis both in
            # the sampler and the renderer, so batch sizes are rounded up to
            # device-count multiples (the work per object is identical, so
            # rounding only changes the grouping)
            n_dev = mesh.devices.size
            r = lambda v: max(n_dev, (v + n_dev - 1) // n_dev * n_dev)
            if (self.generate_batch_size % n_dev or
                    self.render_object_batch % n_dev):
                self.generate_batch_size = r(self.generate_batch_size)
                self.render_object_batch = r(self.render_object_batch)
                logging.info(
                    f"diffusion eval on {n_dev} devices: batch sizes rounded "
                    f"to generate={self.generate_batch_size}, "
                    f"render_objects={self.render_object_batch}"
                )

        self.poses = poses if poses is not None else np.load(poses_path)
        self.intrinsics = (
            intrinsics if intrinsics is not None else np.load(intrinsics_path)
        )
        self.poses = np.asarray(self.poses, np.float32)
        self.intrinsics = np.asarray(self.intrinsics, np.float32)
        if max_poses is not None:  # testing/debug extension; parity uses all
            self.poses = self.poses[:max_poses]
            self.intrinsics = self.intrinsics[:max_poses]

        if isinstance(feature_extractor, str):
            kind, _, arg = feature_extractor.partition(":")
            if kind == "random_projection":
                # deterministic test-only extractor
                d = int(arg or 8)
                proj = np.random.default_rng(0).normal(
                    size=(resolution * resolution * 3, d)
                ).astype(np.float32)
                feature_extractor = lambda imgs: imgs.reshape(len(imgs), -1) @ proj
            elif kind == "inception_jax":
                # TPU-native InceptionV3 (keras weights h5); keeps the whole
                # generate->render->score loop on device. Not number-
                # comparable with the mmgen TorchScript graph — see
                # utils/inception_jax.py.
                if not arg:
                    raise ValueError(
                        "feature_extractor='inception_jax' needs a weights "
                        "file: pass 'inception_jax:<keras_weights.h5>'"
                    )
                from ..utils.inception_jax import JaxInceptionExtractor

                feature_extractor = JaxInceptionExtractor(arg)
            elif kind == "inception_torchscript":
                feature_extractor = TorchScriptInceptionExtractor(arg or None)
            else:
                raise ValueError(f"unknown feature_extractor: {feature_extractor!r}")
        if feature_extractor is None:
            if not _osp.isfile(inception_path):
                raise FileNotFoundError(
                    f"Inception TorchScript graph not found at {inception_path!r}; "
                    "download it (see reference README) or pass feature_extractor."
                )
            feature_extractor = TorchScriptInceptionExtractor(inception_path)
        self.feature_extractor = feature_extractor

    def __call__(
        self,
        model,  # NPCD facade
        pointnerf_params,
        diffusion_state,
        rng: Optional[jax.Array] = None,
        num_qualitatives: int = 10,
    ) -> pd.Series:
        if self.out_dir is not None:
            os.makedirs(self.out_dir, exist_ok=True)
            results_file = osp.join(self.out_dir, "results.pickle")
            if osp.exists(results_file):  # idempotent (reference :103-106)
                logging.info("Diffusion evaluation already finished; skipping.")
                return pd.read_pickle(results_file)

        rng = rng if rng is not None else jax.random.PRNGKey(0)
        data_shard = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            data_shard = NamedSharding(self.mesh, PartitionSpec("data"))
            replicated = NamedSharding(self.mesh, PartitionSpec())
            pointnerf_params = jax.device_put(pointnerf_params, replicated)
            diffusion_state = jax.device_put(diffusion_state, replicated)
        fidkid = FIDKID(
            num_images=self.num_samples * len(self.poses),
            feature_extractor=self.feature_extractor,
            inception_pkl=self.inception_pkl_path,
        )
        fidkid.prepare()

        num_poses = len(self.poses)
        pose_batches = list(chunks(list(range(num_poses)), self.render_pose_batch))

        render_pn = model.pointnerf
        if self.render_dtype is not None:
            import copy
            import dataclasses

            render_pn = copy.copy(render_pn)
            render_pn.cfg = dataclasses.replace(
                render_pn.cfg, compute_dtype=jnp.dtype(self.render_dtype).type)

        @jax.jit
        def render_poses(params, coords, feats, extr, intr):
            out = render_pn.render(
                params, coords, feats, extr, intr, resolution=self.resolution
            )
            return out["channels"]

        executor = feed_futures = None
        if self.overlap_extraction:
            from concurrent.futures import ThreadPoolExecutor

            executor = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="fid-extract"
            )
            feed_futures = []

        qualitative_stride_holder = []
        device_feed = bool(getattr(self.feature_extractor, "device_resident",
                                   False))
        if device_feed:
            @jax.jit
            def quantize_dev(imgs):  # [g, num_poses*H*W, 3] -> quantized
                x = jnp.clip(imgs, 0.0, 1.0)
                return jnp.round(x * 255.0) / 255.0

        def process_group(images_dev, g, first_idx):
            """255-quantization, Inception feed, and qualitative saves for
            one render group — run on the worker thread so the work (D2H
            transfer for a host extractor, ~590 MB/group here) overlaps
            the next group's TPU renders instead of blocking them.

            With a device-resident extractor (JaxInceptionExtractor) the
            renders never round-trip through the host: quantization runs
            on device and the extractor slices its batches on device; only
            the [N, 2048] features and the strided qualitative images come
            back (over a tunneled device the per-batch host hop was the
            measured extraction ceiling, docs/experiments/fid_extract.json)."""
            if device_feed:
                images_q = quantize_dev(
                    jnp.concatenate(images_dev, 1)
                )  # [g, num_poses*H*W, 3] on device
                fidkid.feed(
                    images_q.reshape(g * num_poses, self.resolution,
                                     self.resolution, 3),
                    "fakes",
                )
                if self.out_dir is not None:
                    stride = qualitative_stride_holder[0]
                    for jj in range(g):
                        if (first_idx + jj) % stride == 0:
                            img = np.asarray(images_q[jj]).reshape(
                                num_poses, self.resolution,
                                self.resolution, 3)
                            self._save_qualitative(img, first_idx + jj)
                return
            images = np.concatenate(
                [np.asarray(c) for c in images_dev], 1
            ).reshape(g, num_poses, self.resolution, self.resolution, 3)
            images = np.clip(images, 0.0, 1.0)
            images = np.round(images * 255.0) / 255.0  # 255-level quantization
            fidkid.feed(
                images.reshape(g * num_poses, self.resolution,
                               self.resolution, 3),
                "fakes",
            )
            if self.out_dir is not None:
                stride = qualitative_stride_holder[0]
                for jj in range(g):
                    if (first_idx + jj) % stride == 0:
                        self._save_qualitative(images[jj], first_idx + jj)

        def submit_group(images_dev, g, first_idx):
            if executor is None:
                process_group(images_dev, g, first_idx)
                return
            while len(feed_futures) >= 2:  # bound the image backlog
                feed_futures.pop(0).result()
            feed_futures.append(
                executor.submit(process_group, images_dev, g, first_idx)
            )

        done = 0
        qualitative_stride_holder.append(
            max(1, self.num_samples // max(num_qualitatives, 1))
        )
        for gen_idx, n_gen in enumerate(
            split_num(self.num_samples, self.generate_batch_size)
        ):
            rng, rng_gen = jax.random.split(rng)
            coords_b, feats_b = model.diffusion.generate(
                diffusion_state, rng_gen, num=n_gen, batch_size=n_gen,
                progress=False, data_sharding=data_shard,
            )  # [n, 3, P], [n, F, P]

            # render multiple generated objects x a pose batch per jit call
            # (the chunked render core takes an instance dim, so G*Vb
            # instances are a near-free multiple vs the reference's
            # render_batch_size=1 loop, diffusion_evaluation.py:163-175),
            # and feed Inception with all G*num_poses images at once (the
            # extractor chunks internally)
            for j0 in range(0, n_gen, self.render_object_batch):
                g = min(self.render_object_batch, n_gen - j0)
                # objects shard over 'data' (each device renders g/n_dev
                # objects x the pose batch); indivisible tails run unsharded
                shard = (
                    data_shard
                    if data_shard is not None
                    and g % self.mesh.devices.size == 0
                    else None
                )
                put = (lambda a: jax.device_put(a, shard)) if shard else jnp.asarray
                coords = put(
                    np.ascontiguousarray(coords_b[j0 : j0 + g].transpose(0, 2, 1))
                )  # [g, P, 3]
                feats = put(
                    np.ascontiguousarray(feats_b[j0 : j0 + g].transpose(0, 2, 1))
                )
                images_dev = []
                for pose_idx in pose_batches:
                    extr = put(
                        np.ascontiguousarray(np.broadcast_to(
                            self.poses[pose_idx][None],
                            (g, len(pose_idx), 4, 4),
                        ))
                    )
                    intr = put(
                        np.ascontiguousarray(np.broadcast_to(
                            self.intrinsics[pose_idx][None],
                            (g, len(pose_idx), 3, 3),
                        ))
                    )
                    channels = render_poses(
                        pointnerf_params, coords, feats, extr, intr
                    )  # [g, Vb, H*W, 3] — stays on device; the worker
                    # fetches it so D2H overlaps the next renders
                    images_dev.append(channels)
                submit_group(images_dev, g, done)
                done += g
            if self.verbose:
                logging.info(f"diffusion eval: {done}/{self.num_samples} objects")

        if executor is not None:
            for f in feed_futures:  # drain (re-raises extraction errors)
                f.result()
            executor.shutdown()

        results = pd.Series(fidkid.summary(), name="metric")
        logging.info(f"Diffusion evaluation results:\n{results}")
        writer.put_scalar_dict(
            "eval/diffusion/unconditional_generation", results.to_dict(), 0
        )
        writer.write_out_storage()
        if self.out_dir is not None:
            results.to_pickle(osp.join(self.out_dir, "results.pickle"))
            results.to_csv(osp.join(self.out_dir, "results.csv"))
        return results

    def _save_qualitative(self, images: np.ndarray, sample_idx: int):
        try:
            from ..utils.vis import vis_image

            # a few of the fixed test poses side by side (reference logs
            # pose batches, diffusion_evaluation.py:200-203)
            img = vis_image(images[:4].transpose(0, 3, 1, 2), full_batch=True)
            img.save(osp.join(self.out_dir, f"sample{sample_idx:04d}.png"))
        except Exception as e:
            logging.warning(f"qualitative save failed: {e}")

