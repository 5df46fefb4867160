"""SRN-ShapeNet dataset loaders (cars/chairs).

Rebuild of the reference SRN loader (npcd/data/srn.py): one sample = one
object with all 50 training views; images, cameras and FPS point clouds are
preloaded into RAM with a thread pool. File-format contract is identical to
the reference (rgb/%06d.png, pose/%06d.txt cam2world, intrinsics.txt,
pointcloud3_<P>.npz with FPS fallback from pointcloud3.npz via our JAX FPS
op). Images are float32 [V, H*W, 3] row-major pixels, matching the render
path's flat ray indexing.
"""
from __future__ import annotations

import os
import os.path as osp
import random
from typing import Dict, List, Optional, Tuple

import numpy as np
from PIL import Image

from ..utils.util import chunks
from .dataset import Dataset, get_path
from .registry import register_dataset


def _load_image(path: str, view: int, image_size: int) -> np.ndarray:
    fname = f"{path}/rgb/{view:06d}.png"
    img = Image.open(fname).convert("RGB").resize((image_size, image_size))
    return (np.asarray(img, np.float32) / 255.0)  # [H, W, 3]


def _load_camera(path: str, view: int, image_size: int) -> Tuple[np.ndarray, np.ndarray]:
    pose = np.loadtxt(f"{path}/pose/{view:06d}.txt").reshape(4, 4).astype(np.float32)
    # pose file is cam2world; invert to world2cam
    world2cam = pose.copy()
    world2cam[:3, :3] = pose[:3, :3].T
    world2cam[:3, 3:] = -world2cam[:3, :3] @ pose[:3, 3:]
    intr = _parse_intrinsics(f"{path}/intrinsics.txt", image_size)
    return world2cam, intr


def _parse_intrinsics(file_path: str, image_size: int) -> np.ndarray:
    with open(file_path, "r") as f:
        focal, cx, cy, _ = map(float, f.readline().split())
        next(f)
        next(f)
        height, width = map(float, f.readline().split())
    assert height == width, f"non-square intrinsics in {file_path}"
    cx = cx / width * image_size
    cy = cy / height * image_size
    focal = focal / height * image_size
    return np.array([[focal, 0, cx], [0, focal, cy], [0, 0, 1]], np.float32)


def _load_pointcloud(path: str, num_points: int) -> np.ndarray:
    cached = f"{path}/pointcloud3_{num_points}.npz"
    if osp.isfile(cached):
        return np.load(cached)["points"].astype(np.float32)

    npz = np.load(f"{path}/pointcloud3.npz")
    points = np.asarray(npz["points"], np.float32)
    # native C++ FPS (npcd_tpu/runtime): 27 ms vs 137 ms for the jax-CPU
    # fori_loop at 30k->512 on this host; identical selected set. Falls back
    # to numpy inside runtime.fps when the library is unavailable.
    from .. import runtime

    idx = runtime.fps(points, num_points)
    sampled = points[idx]
    normals = np.asarray(npz["normals"], np.float32)[idx]
    try:
        np.savez(cached, points=sampled, normals=normals)
    except OSError:
        pass
    return sampled


class SRNTrain(Dataset):
    def __init__(
        self,
        root: str,
        sample_list: List[Tuple[str, str, int]],
        views_per_sample: int = 50,
        image_size: int = 128,
        num_points: int = 512,
        **kwargs,
    ):
        super().__init__(
            root=root,
            sample_list=sample_list,
            views_per_sample=views_per_sample,
            image_size=image_size,
            num_points=num_points,
            **kwargs,
        )

    def _init_samples(self, sample_list, views_per_sample=50, image_size=128,
                      num_points=512, native_decode=False):
        assert 50 % views_per_sample == 0
        self.image_size = image_size
        self.num_points = num_points
        view_indices = list(range(50))

        decode = None
        if native_decode:
            # C++ libpng decode path (npcd_tpu/runtime). Opt-in for two
            # measured/behavioral reasons: (a) its bilinear resize differs
            # slightly from PIL's filter, so GT-parity evals should keep the
            # PIL path the reference uses; (b) on a 1-core host PIL decodes
            # faster (17.4 vs 28.8 ms per 50 same-size images) - the
            # thread-pooled path needs multiple cores to pay off.
            from .. import runtime

            if runtime.available():
                decode = lambda paths: runtime.decode_png_batch(paths, image_size)

        def load_object(entry):
            c, m, i = entry
            path = f"{self.root}/{c}/{m}"
            pc = _load_pointcloud(path, num_points)
            if decode is not None:
                images = decode(
                    [f"{path}/rgb/{v:06d}.png" for v in view_indices]
                )  # [50, H, W, 3]
            else:
                images = np.stack(
                    [_load_image(path, v, image_size) for v in view_indices]
                )
            cams = [_load_camera(path, v, image_size) for v in view_indices]
            extr = np.stack([e for e, _ in cams])
            intr = np.stack([k for _, k in cams])
            return pc, images, extr, intr

        loaded = self.preload_threading(load_object, sample_list, data_str="objects")
        self.pcs = [pc for pc, _, _, _ in loaded]

        for (c, m, i), (pc, images, extr, intr) in zip(sample_list, loaded):
            views = list(view_indices)
            random.shuffle(views)
            for vs in chunks(views, views_per_sample):
                vs = list(vs)
                self.samples.append(
                    {
                        "obj_idx": np.int32(i),
                        "obj_name": m,
                        "images": images[vs].reshape(len(vs), -1, 3),  # [V, H*W, 3]
                        "extrinsics": extr[vs],
                        "intrinsics": intr[vs],
                        "view_indices": np.asarray(vs, np.int32),
                    }
                )

    def get_all_coords(self) -> np.ndarray:
        return np.stack(self.pcs)  # [n_obj, num_points, 3]


def _read_split(split: str, blacklist: Optional[str]) -> List[Tuple[str, str, int]]:
    lists_dir = osp.join(osp.dirname(osp.realpath(__file__)), "sample_lists")
    black = set()
    if blacklist:
        with open(osp.join(lists_dir, blacklist)) as f:
            black = set(f.read().splitlines())
    out = []
    i = 0
    category = split.split("_")[0]
    with open(osp.join(lists_dir, f"srn_{split}.list")) as f:
        for shapenet_id in f.read().splitlines():
            if shapenet_id not in black:
                out.append((category, shapenet_id, i))
                i += 1
    return out


@register_dataset
class SRNCarsTrain(SRNTrain):
    def __init__(self, root: Optional[str] = None, sample_list=None, **kwargs):
        root = root if root is not None else get_path("srn", "root")
        if sample_list is None:
            sample_list = _read_split("cars_train", "srn_cars_blacklist.list")
        super().__init__(root=root, sample_list=sample_list, **kwargs)


@register_dataset
class SRNChairsTrain(SRNTrain):
    # The reference ships no chairs sample list (only srn_cars_*.list);
    # `sample_list` lets callers/tests supply one explicitly until the SRN
    # chairs split file is staged (see ASSETS.md).
    def __init__(self, root: Optional[str] = None, sample_list=None, **kwargs):
        root = root if root is not None else get_path("srn", "root")
        if sample_list is None:
            sample_list = _read_split("chairs_train", None)
        super().__init__(root=root, sample_list=sample_list, **kwargs)
