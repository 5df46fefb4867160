"""End-to-end two-stage pipeline smoke tests (tiny shapes)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from npcd_tpu.data import PointNeRFDataset, create_dataset
from npcd_tpu.models.diffusion import DiffusionModel
from npcd_tpu.models.pointnerf import PointNeRF, PointNeRFRenderConfig
from npcd_tpu.train import DiffusionTraining, PointNeRFTraining
from npcd_tpu.utils.config import pointnerf_default_options


@pytest.mark.slow
def test_two_stage_pipeline(tmp_path):
    ds = create_dataset("SyntheticNPCTrain", n_obj=4, num_views=2,
                        image_size=12, num_points=16, verbose=False)
    opts = pointnerf_default_options(num_points=16, feat_dim=4)
    opts = dataclasses.replace(
        opts,
        renderer=dataclasses.replace(opts.renderer, depth_resolution=16, ray_subsamples=24),
        aggregator=dataclasses.replace(opts.aggregator, max_shading_pts=6),
        default_resolution=12,
    )
    pn = PointNeRF(n_obj=4, feats_dim=4, num_points=16, opts=opts,
                   render_config=PointNeRFRenderConfig(train_rays=8, train_ray_chunk=8, eval_ray_chunk=48))
    tr = PointNeRFTraining(str(tmp_path / "pn"), pn, ds, batch_size=2,
                           base_learning_rate=1e-3, max_epochs=1,
                           save_checkpoint_interval_min=1e9, verbose=False)
    state = tr()
    assert int(state.step) == 2  # 4 objects / batch 2 * 1 epoch

    lat = PointNeRFDataset(pointnerf=pn, params=jax.device_get(state.params), verbose=False)
    dm = DiffusionModel(coords_dim=3, feats_dim=4, num_points=16,
                        width=16, layers=1, heads=2, attn_impl="einsum")
    dt = DiffusionTraining(str(tmp_path / "diff"), dm, lat, batch_size=2,
                           base_learning_rate=7e-5, weight_decay=0.01,
                           max_iterations=3, use_ema=True,
                           ema_params=[(1, 0.9999, 0.9999, False)],
                           save_checkpoint_interval_min=1e9,
                           weights_only_interval=10 ** 9, verbose=False)
    dstate = dt()
    assert int(dstate.step) == 3

    coords, feats = dm.generate(
        dstate.diffusion_state(params=dstate.ema_params[0]),
        jax.random.PRNGKey(0), num=2, batch_size=2,
    )
    assert coords.shape == (2, 3, 16) and feats.shape == (2, 4, 16)
    assert np.isfinite(coords).all() and np.isfinite(feats).all()
    # generated coords live in (roughly) the denormalized latent range
    assert np.abs(coords).max() < 50


@pytest.mark.slow
def test_pointnerf_overfits_single_scene(tmp_path):
    """Training on one tiny scene must reduce the reconstruction loss —
    the executable counterpart of the reference's PSNR regression."""
    import optax

    from npcd_tpu.losses import PointNeRFLossWeights, pointnerf_loss
    from npcd_tpu.train.pointnerf_training import (
        PointNeRFTrainState,
        make_pointnerf_optimizer,
        make_pointnerf_train_step,
    )

    ds = create_dataset("SyntheticNPCTrain", n_obj=2, num_views=2,
                        image_size=12, num_points=16, verbose=False)
    opts = pointnerf_default_options(num_points=16, feat_dim=4)
    opts = dataclasses.replace(
        opts,
        renderer=dataclasses.replace(opts.renderer, depth_resolution=16, ray_subsamples=32),
        aggregator=dataclasses.replace(opts.aggregator, max_shading_pts=6),
        default_resolution=12,
    )
    pn = PointNeRF(n_obj=2, feats_dim=4, num_points=16, opts=opts,
                   render_config=PointNeRFRenderConfig(train_rays=16, train_ray_chunk=16, eval_ray_chunk=48))
    params = pn.set_all_coords(pn.init_params(jax.random.PRNGKey(0)), ds.get_all_coords())
    # shrink the variational std (log_var -6) so the overfit signal isn't
    # swamped by unit-variance reparametrization noise within a short run
    params["feats_table"] = params["feats_table"].at[..., 4:].set(-6.0)
    tx = make_pointnerf_optimizer(5e-3)
    state = PointNeRFTrainState(params=params, opt_state=tx.init(params),
                                step=jnp.zeros((), jnp.int32))
    step = make_pointnerf_train_step(pn, tx, PointNeRFLossWeights(1.0, 1e-7, 3.5e-7))

    from npcd_tpu.data.dataset import collate

    batch = collate([ds[0], ds[1]])
    feed = {k: batch[k] for k in ("obj_idx", "images", "intrinsics", "extrinsics")}

    losses = []
    for i in range(200):
        state, metrics = step(state, feed, jax.random.fold_in(jax.random.PRNGKey(1), i))
        losses.append(float(metrics["loss"]))
    assert np.mean(losses[-10:]) < np.mean(losses[:5]) * 0.7, (np.mean(losses[:5]), np.mean(losses[-10:]))


@pytest.mark.slow
def test_chairs_pipeline_smoke(tmp_path):
    """BASELINE stretch config #5 exercise: SRN *chairs* file contract ->
    SRNChairsTrain loader -> stage-1 step -> latent dataset -> stage-2 step
    -> DiffusionEvaluation from the shipped chairs test poses.

    Builds a tiny on-disk fixture in the exact SRN layout
    (root/chairs/<id>/{rgb/%06d.png, pose/%06d.txt, intrinsics.txt,
    pointcloud3.npz}) with real chairs test-pose geometry (radius-2
    cameras), so every path the cars pipeline uses is exercised with the
    chairs dataset/config wiring.
    """
    import os

    from PIL import Image

    from npcd_tpu.data.srn import SRNChairsTrain
    from npcd_tpu.eval.diffusion_evaluation import DiffusionEvaluation
    from npcd_tpu.models.npcd import NPCD
    from npcd_tpu.utils.config import load_config

    res = 16
    poses_w2c = np.load("data/srnchairs_test_poses.npy")  # [251, 4, 4]
    rng = np.random.default_rng(0)

    root = tmp_path / "srn"
    sample_list = []
    for k in range(2):
        obj = f"chair{k}"
        d = root / "chairs" / obj
        os.makedirs(d / "rgb")
        os.makedirs(d / "pose")
        for v in range(50):
            img = (rng.uniform(0, 255, (res, res, 3))).astype(np.uint8)
            Image.fromarray(img).save(d / "rgb" / f"{v:06d}.png")
            w2c = poses_w2c[v % len(poses_w2c)]
            c2w = np.eye(4, dtype=np.float64)
            c2w[:3, :3] = w2c[:3, :3].T
            c2w[:3, 3] = -w2c[:3, :3].T @ w2c[:3, 3]
            np.savetxt(d / "pose" / f"{v:06d}.txt", c2w.reshape(1, 16))
        # chairs intrinsics at the native 128 scale (loader rescales)
        with open(d / "intrinsics.txt", "w") as f:
            f.write("131.25 64.0 64.0 0.\n0. 0. 0.\n1.\n128 128\n")
        pts = rng.uniform(-0.4, 0.4, (64, 3)).astype(np.float32)
        np.savez(d / "pointcloud3.npz", points=pts, normals=pts)
        sample_list.append(("chairs", obj, k))

    ds = SRNChairsTrain(root=str(root), sample_list=sample_list,
                        views_per_sample=25, image_size=res, num_points=16,
                        verbose=False)
    assert len(ds) == 4  # 2 objects x (50 views / 25 per sample)
    assert ds.get_all_coords().shape == (2, 16, 3)

    # config wiring: the chairs yaml parses and names this dataset/protocol
    cfg = load_config("configs/npcd_srnchairs.yaml")
    assert cfg["train_dataset"] == "SRNChairsTrain"
    assert "srnchairs_test_poses" in cfg["diffusion_evaluation"]["poses_path"]

    opts = pointnerf_default_options(num_points=16, feat_dim=4)
    opts = dataclasses.replace(
        opts,
        renderer=dataclasses.replace(opts.renderer, depth_resolution=16,
                                     ray_subsamples=24),
        aggregator=dataclasses.replace(opts.aggregator, max_shading_pts=6),
        default_resolution=res,
    )
    pn = PointNeRF(n_obj=2, feats_dim=4, num_points=16, opts=opts,
                   render_config=PointNeRFRenderConfig(
                       train_rays=8, train_ray_chunk=8, eval_ray_chunk=48))
    tr = PointNeRFTraining(str(tmp_path / "pn"), pn, ds, batch_size=2,
                           base_learning_rate=1e-3, max_epochs=1,
                           save_checkpoint_interval_min=1e9, verbose=False)
    state = tr()
    assert int(state.step) == 2  # 4 samples / batch 2

    lat = PointNeRFDataset(pointnerf=pn, params=jax.device_get(state.params),
                           verbose=False)
    dm = DiffusionModel(coords_dim=3, feats_dim=4, num_points=16,
                        width=16, layers=1, heads=2, attn_impl="einsum")
    dt = DiffusionTraining(str(tmp_path / "diff"), dm, lat, batch_size=2,
                           base_learning_rate=7e-5, weight_decay=0.01,
                           max_iterations=2, use_ema=True,
                           ema_params=[(1, 0.9999, 0.9999, False)],
                           save_checkpoint_interval_min=1e9,
                           weights_only_interval=10 ** 9, verbose=False)
    dstate = dt()

    # eval protocol from the shipped chairs test poses (scaled to the tiny
    # fixture resolution), random-projection extractor (no Inception assets)
    import pickle

    intr = np.load("data/srnchairs_test_intrinsics.npy")[:2] * (res / 128.0)
    intr[:, 2, 2] = 1.0
    proj_rng = np.random.default_rng(1)
    real = proj_rng.uniform(0, 1, (8, res * res * 3)).astype(np.float32)
    proj = np.random.default_rng(0).normal(size=(res * res * 3, 8)).astype(np.float32)
    feats = real @ proj
    with open(tmp_path / "stats.pkl", "wb") as f:
        pickle.dump({"mean": feats.mean(0),
                     "cov": np.cov(feats, rowvar=False), "feats_np": feats}, f)

    npcd = NPCD.__new__(NPCD)
    npcd.pointnerf, npcd.diffusion = pn, dm
    npcd.pointnerf_only = False
    ev = DiffusionEvaluation(
        out_dir=str(tmp_path / "eval"), num_samples=2,
        poses=poses_w2c[:2], intrinsics=intr,
        inception_pkl_path=str(tmp_path / "stats.pkl"),
        feature_extractor="random_projection:8",
        generate_batch_size=2, render_pose_batch=2, resolution=res,
        verbose=False,
    )
    results = ev(npcd, jax.device_get(state.params),
                 dstate.diffusion_state(params=dstate.ema_params[0]),
                 rng=jax.random.PRNGKey(3))
    assert np.isfinite(results["fid"]) and results["fid"] >= 0
