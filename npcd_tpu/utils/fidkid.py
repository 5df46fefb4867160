"""FID + KID computation.

Rebuild of the reference FIDKID (npcd/utils/fidkid.py, itself derived from
SSDNeRF/mmgen/stylegan2-ada): Frechet Inception Distance between real and
fake feature gaussians plus the stylegan2-ada subset-based Kernel Inception
Distance estimator (polynomial kernel (x.y/d + 1)^3, 100 subsets of up to
1000 features).

The feature extractor is pluggable:
  * TorchScriptInceptionExtractor — loads the StyleGAN TorchScript Inception
    graph (data/inception-2015-12-05.pt, the network used for the published
    FID 28.6) and runs it on CPU via torch. Metric code, not model code.
  * Any callable images[N, H, W, 3] in [0, 1] -> feats [N, D] works, which
    is what the tests use.

Real statistics load from the reference's pickle format
{mean, cov, feats_np} (fidkid.py:47-55).
"""
from __future__ import annotations

import pickle
from typing import Callable, Dict, Optional

import numpy as np


def calc_fid(
    fake_mean: np.ndarray,
    fake_cov: np.ndarray,
    real_mean: np.ndarray,
    real_cov: np.ndarray,
    eps: float = 1e-6,
):
    """Frechet distance between two gaussians (standard TTUR formulation).

    Returns (fid, mean_term, cov_term)."""
    import scipy.linalg

    diff = fake_mean - real_mean
    mean_term = float(diff @ diff)

    covmean, _ = scipy.linalg.sqrtm(fake_cov @ real_cov, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(fake_cov.shape[0]) * eps
        covmean = scipy.linalg.sqrtm(
            (fake_cov + offset) @ (real_cov + offset)
        )
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    cov_term = float(
        np.trace(fake_cov) + np.trace(real_cov) - 2 * np.trace(covmean)
    )
    return mean_term + cov_term, mean_term, cov_term


def calc_kid(
    real_feat: np.ndarray,
    fake_feat: np.ndarray,
    num_subsets: int = 100,
    max_subset_size: int = 1000,
    rng: Optional[np.random.Generator] = None,
) -> float:
    """stylegan2-ada subset MMD estimator (reference fidkid.py:57-82)."""
    rng = rng or np.random.default_rng()
    n = real_feat.shape[1]
    m = min(min(real_feat.shape[0], fake_feat.shape[0]), max_subset_size)
    t = 0.0
    for _ in range(num_subsets):
        x = fake_feat[rng.choice(fake_feat.shape[0], m, replace=False)]
        y = real_feat[rng.choice(real_feat.shape[0], m, replace=False)]
        a = (x @ x.T / n + 1) ** 3 + (y @ y.T / n + 1) ** 3
        b = (x @ y.T / n + 1) ** 3
        t += (a.sum() - np.diag(a).sum()) / (m - 1) - b.sum() * 2 / m
    return float(t / num_subsets / m)


class TorchScriptInceptionExtractor:
    """StyleGAN TorchScript Inception features on CPU torch.

    Input images: [N, H, W, 3] float in [0, 1]. The tensor handed to the
    TorchScript graph reproduces the reference pipeline exactly: images go
    through `img * 2 - 1` into the metric (diffusion_evaluation.py:181),
    and the mmgen StyleGAN-style feed_op then computes
    `(x * 127.5 + 128).clamp(0, 255).to(torch.uint8)` in NCHW (the
    stylegan2-ada constant mmgen inherits) — for the reference's
    255-level-quantized renders this lands on exactly round(img*255).
    Pinned by tests/test_eval_pipelines.py::test_inception_feed_contract.
    """

    def __init__(self, inception_path: Optional[str] = None,
                 batch_size: int = 32, model=None):
        import torch

        self._torch = torch
        self.model = (
            model if model is not None
            else torch.jit.load(inception_path, map_location="cpu").eval()
        )
        self.batch_size = batch_size

    def __call__(self, images: np.ndarray) -> np.ndarray:
        torch = self._torch
        feats = []
        with torch.no_grad():
            for start in range(0, len(images), self.batch_size):
                chunk = images[start:start + self.batch_size]
                # [0,1] HWC -> [-1,1] NCHW (reference feed, :181)
                x = torch.from_numpy(
                    (chunk * 2.0 - 1.0).transpose(0, 3, 1, 2).astype(np.float32)
                )
                # mmgen StyleGAN feed_op: uint8-range, uint8 dtype
                x = (x * 127.5 + 128).clamp(0, 255).to(torch.uint8)
                feats.append(self.model(x, return_features=True).numpy())
        return np.concatenate(feats, 0)


class FIDKID:
    """Streaming FID/KID accumulator with a pluggable feature extractor."""

    def __init__(
        self,
        num_images: int,
        feature_extractor: Callable[[np.ndarray], np.ndarray],
        inception_pkl: Optional[str] = None,
        num_subsets: int = 100,
        max_subset_size: int = 1000,
    ):
        self.num_images = num_images
        self.extract = feature_extractor
        self.inception_pkl = inception_pkl
        self.num_subsets = num_subsets
        self.max_subset_size = max_subset_size
        self.real_mean = self.real_cov = self.real_feats_np = None
        self._fake_feats = []
        self._real_feats = []

    def prepare(self) -> None:
        if self.inception_pkl is not None:
            with open(self.inception_pkl, "rb") as f:
                ref = pickle.load(f)
            self.real_mean = ref["mean"]
            self.real_cov = ref["cov"]
            self.real_feats_np = ref["feats_np"]

    def feed(self, images: np.ndarray, kind: str) -> None:
        """images: [N, H, W, 3] in [0, 1]."""
        feats = self.extract(images)
        (self._fake_feats if kind == "fakes" else self._real_feats).append(feats)

    def summary(self, seed: Optional[int] = None) -> Dict[str, float]:
        if self.real_feats_np is None:
            if not self._real_feats:
                raise ValueError(
                    "no real statistics: provide inception_pkl or feed(..., 'reals')"
                )
            real = np.concatenate(self._real_feats, 0)[: self.num_images]
            self.real_feats_np = real
            self.real_mean = real.mean(0)
            self.real_cov = np.cov(real, rowvar=False)

        fake = np.concatenate(self._fake_feats, 0)[: self.num_images]
        fake_mean = fake.mean(0)
        fake_cov = np.cov(fake, rowvar=False)

        fid, mean_term, cov_term = calc_fid(
            fake_mean, fake_cov, self.real_mean, self.real_cov
        )
        kid = calc_kid(
            self.real_feats_np, fake, self.num_subsets, self.max_subset_size,
            rng=np.random.default_rng(seed),
        ) * 1000
        return {"fid": fid, "fid_mean": mean_term, "fid_cov": cov_term, "kid": kid}
