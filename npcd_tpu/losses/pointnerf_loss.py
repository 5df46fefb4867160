"""Stage-1 composite loss: reconstruction + KL + total variation.

Rebuild of the reference losses (npcd/losses/): pure functions over
(sample, pred, aux). Fixed-shape adaptations:

  * reconstruction (image_reconstruction_loss.py:28-40): GT pixels gathered
    by pred['ray_idx'], masked mean over valid selected rays (the reference
    averages over its ragged all-valid ray set).
  * KL (neural_point_cloud_kl_loss.py:33-44): standard VAE KL on the
    variational feature embeddings.
  * TV (neural_point_cloud_tv_loss.py:29-83): inverse-distance-weighted L1
    feature difference over each point's k nearest in-radius neighbors
    within its own cloud. Dense formulation note: self-pairs contribute
    exactly zero (|f_i - f_i| = 0), so unlike the reference we keep them in
    the sum instead of masking them — identical value, no scatter surgery.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops.knn import dense_knn
from ..utils.config import PointNeRFOptions


class PointNeRFLossWeights(NamedTuple):
    image_reconstruction: float = 1.0
    neural_point_cloud_kl: float = 1.0
    neural_point_cloud_tv: float = 1.0


def image_reconstruction_loss(
    gt_images: jnp.ndarray,  # [B, V, H*W, 3] (flattened pixels), or
    #                          [B, V, R_pre, 3] host-presampled pixels
    pred: Dict[str, jnp.ndarray],
    weight: float = 1.0,
    presampled_images: bool = False,
) -> jnp.ndarray:
    if presampled_images:
        # gt_images hold only the presampled pixel subset; gather by the
        # in-presample position of each selected ray (pred['ray_sel']),
        # not the flat pixel id. Same gathered values as the full-frame
        # path by construction (pixel_idx[sel] == ray_idx).
        gt = jnp.take_along_axis(gt_images, pred["ray_sel"][..., None], axis=2)
    elif pred.get("ray_idx") is not None:
        gt = jnp.take_along_axis(gt_images, pred["ray_idx"][..., None], axis=2)
    else:
        gt = gt_images
    err = (pred["channels"] - gt) ** 2  # [B, V, R, 3]
    valid = pred.get("ray_valid")
    if valid is not None:
        valid = valid[..., None].astype(err.dtype)
        loss = jnp.sum(err * valid) / jnp.maximum(jnp.sum(valid) * err.shape[-1], 1.0)
    else:
        loss = err.mean()
    return loss * weight


def neural_point_cloud_kl_loss(
    aux: Dict[str, jnp.ndarray], weight: float = 1.0
) -> jnp.ndarray:
    mean, log_var = aux["feats_mean"], aux["feats_log_var"]
    kld = -0.5 * jnp.sum(1 + log_var - mean ** 2 - jnp.exp(log_var), axis=-1)
    return kld.mean() * weight


def neural_point_cloud_tv_loss(
    aux: Dict[str, jnp.ndarray],
    opts: PointNeRFOptions,
    weight: float = 1.0,
) -> jnp.ndarray:
    coords = jax.lax.stop_gradient(aux["coords"])  # [B, P, 3]
    feats = aux["feats"]  # [B, P, F] (mean embeddings)

    idx, nb_mask = jax.vmap(
        lambda p: dense_knn(p, p, opts.aggregator.k, opts.knn_radius)
    )(coords)  # [B, P, k]

    nb_pos = jax.vmap(lambda t, i: t[i])(coords, idx)
    nb_feat = jax.vmap(lambda t, i: t[i])(feats, idx)

    d = jnp.linalg.norm(nb_pos - coords[:, :, None, :], axis=-1)
    w = (1.0 / (d + 1e-5)) * nb_mask.astype(d.dtype)
    feat_dist = jnp.sum(jnp.abs(nb_feat - feats[:, :, None, :]), axis=-1)  # L1
    tv = jnp.sum(w * feat_dist, axis=-1)  # [B, P]
    return tv.mean() * weight


def pointnerf_loss(
    sample: Dict[str, jnp.ndarray],
    pred: Dict[str, jnp.ndarray],
    aux: Dict[str, jnp.ndarray],
    opts: PointNeRFOptions,
    weights: PointNeRFLossWeights = PointNeRFLossWeights(),
    presampled_images: bool = False,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    recon = image_reconstruction_loss(
        sample["images"], pred, weights.image_reconstruction,
        presampled_images=presampled_images,
    )
    kl = neural_point_cloud_kl_loss(aux, weights.neural_point_cloud_kl)
    tv = neural_point_cloud_tv_loss(aux, opts, weights.neural_point_cloud_tv)
    total = recon + kl + tv
    sub_losses = {
        "00_image_reconstruction_loss": recon,
        "01_neural_point_cloud_kl": kl,
        "02_neural_point_cloud_tv": tv,
    }
    return total, sub_losses
