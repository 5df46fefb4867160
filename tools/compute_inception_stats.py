#!/usr/bin/env python
"""Compute the real-image Inception statistics pickle for FID/KID.

The reference evaluates FID against a precomputed pickle of StyleGAN-
Inception features over SRN cars_test (reference npcd/utils/fidkid.py:47-55
documents the {mean, cov, feats_np} format; the pickle itself comes from the
SSDNeRF pipeline and has no standalone official download). This tool
produces that pickle from the raw SRN test split + the TorchScript
Inception graph, completing the asset chain for tools/parity_eval.py:
everything else (weights, data, inception graph) has an official release.

Protocol (matches SSDNeRF / the reference eval): every view of every test
object at 128x128, images in [0, 1], fed through the same extractor feed
contract as the fakes (utils/fidkid.py TorchScriptInceptionExtractor —
pinned by tests/test_eval_pipelines.py::test_inception_feed_contract).

Usage:
  python tools/compute_inception_stats.py \
      --srn-test-root data/cars_test \
      --inception data/inception-2015-12-05.pt \
      --out data/cars_test_inception_stylegan.pkl

Directory layout expected under --srn-test-root (reference SRN layout):
  <obj_id>/rgb/000000.png ... , one subdirectory per test object.
"""
from __future__ import annotations

import argparse
import glob
import os.path as osp
import pickle
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def iter_image_batches(root: str, image_size: int, batch_size: int,
                       max_objects: int | None = None):
    """Yield [B, H, W, 3] float batches in [0, 1] over every view of every
    object (sorted for determinism)."""
    from PIL import Image

    obj_dirs = sorted(
        d for d in glob.glob(osp.join(root, "*")) if osp.isdir(osp.join(d, "rgb"))
    )
    if max_objects is not None:
        obj_dirs = obj_dirs[:max_objects]
    if not obj_dirs:
        raise FileNotFoundError(f"no <obj>/rgb directories under {root}")
    buf = []
    n_views = 0
    for d in obj_dirs:
        for fname in sorted(glob.glob(osp.join(d, "rgb", "*.png"))):
            img = Image.open(fname).convert("RGB")
            if img.size != (image_size, image_size):
                img = img.resize((image_size, image_size))
            buf.append(np.asarray(img, np.float32) / 255.0)
            n_views += 1
            if len(buf) == batch_size:
                yield np.stack(buf)
                buf = []
    if buf:
        yield np.stack(buf)
    print(f"{len(obj_dirs)} objects, {n_views} images", file=sys.stderr)


def compute_stats(batches, extractor) -> dict:
    """Run the extractor over image batches; return the reference pickle
    dict {mean, cov, feats_np} (reference fidkid.py:47-55)."""
    feats = [extractor(b) for b in batches]
    feats_np = np.concatenate(feats, 0)
    return {
        "mean": feats_np.mean(0),
        "cov": np.cov(feats_np, rowvar=False),
        "feats_np": feats_np,
    }


def main():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--srn-test-root", required=True,
                   help="SRN test split root (one <obj>/rgb/*.png dir per object)")
    p.add_argument("--inception", required=True,
                   help="inception-2015-12-05.pt TorchScript graph")
    p.add_argument("--out", required=True, help="output pickle path")
    p.add_argument("--image-size", type=int, default=128)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--max-objects", type=int, default=None,
                   help="cap object count (smoke runs)")
    args = p.parse_args()

    from npcd_tpu.utils.fidkid import TorchScriptInceptionExtractor

    extractor = TorchScriptInceptionExtractor(args.inception)
    stats = compute_stats(
        iter_image_batches(args.srn_test_root, args.image_size,
                           args.batch_size, args.max_objects),
        extractor,
    )
    with open(args.out, "wb") as f:
        pickle.dump(stats, f)
    print(
        f"wrote {args.out}: {stats['feats_np'].shape[0]} features of dim "
        f"{stats['feats_np'].shape[1]}"
    )


if __name__ == "__main__":
    main()
