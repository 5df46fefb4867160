"""End-to-end coverage for both evaluation pipelines + the Inception feed.

- DiffusionEvaluation: tiny generate -> render -> FID/KID via the
  deterministic random_projection extractor and a synthetic real-stats
  pickle (the FID-28.6 protocol shape, reference
  diffusion_evaluation.py:146-188), incl. outputs and the idempotent skip.
- PointNeRFEvaluation: PSNR frame, summary/csv outputs, idempotent skip
  (reference pointnerf_evaluation.py:94-97,152-188).
- TorchScriptInceptionExtractor: pins the exact tensor handed to the
  TorchScript graph to the mmgen/stylegan2-ada contract
  ((img*2-1) * 127.5 + 128, clamped, uint8, NCHW).
"""
import dataclasses
import os.path as osp
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from npcd_tpu.data import create_dataset
from npcd_tpu.data.synthetic import random_cameras
from npcd_tpu.eval import DiffusionEvaluation, PointNeRFEvaluation
from npcd_tpu.models.npcd import NPCD
from npcd_tpu.models.pointnerf import PointNeRF, PointNeRFRenderConfig
from npcd_tpu.utils.config import pointnerf_default_options
from npcd_tpu.utils.fidkid import TorchScriptInceptionExtractor

P, FD, RES = 32, 8, 16


def _tiny_npcd():
    npcd = NPCD.__new__(NPCD)
    opts = pointnerf_default_options(num_points=P, feat_dim=FD)
    opts = dataclasses.replace(
        opts,
        renderer=dataclasses.replace(opts.renderer, depth_resolution=16,
                                     ray_subsamples=24),
        aggregator=dataclasses.replace(opts.aggregator, max_shading_pts=6),
        default_resolution=RES,
    )
    npcd.pointnerf = PointNeRF(
        n_obj=4, feats_dim=FD, num_points=P, opts=opts,
        render_config=PointNeRFRenderConfig(train_rays=8, eval_ray_chunk=256),
    )
    from npcd_tpu.models.diffusion import DiffusionModel

    npcd.diffusion = DiffusionModel(
        coords_dim=3, feats_dim=FD, num_points=P, width=32, layers=1,
        heads=2, attn_impl="einsum",
    )
    npcd.pointnerf_only = False
    return npcd


def test_diffusion_evaluation_e2e(tmp_path):
    """Generate -> render from fixed poses -> FID/KID, via the
    random_projection extractor (no Inception assets needed)."""
    npcd = _tiny_npcd()
    pn_params = npcd.pointnerf.init_params(jax.random.PRNGKey(0))
    coords = jax.random.uniform(jax.random.PRNGKey(1), (4, P, 3),
                                minval=-0.4, maxval=0.4)
    pn_params = npcd.pointnerf.set_all_coords(pn_params, coords)
    dstate = npcd.diffusion.init(jax.random.PRNGKey(2))
    dstate = npcd.diffusion.fit_normalizers(
        dstate,
        np.random.default_rng(0).normal(size=(3, 256)).astype(np.float32),
        np.random.default_rng(1).normal(size=(FD, 256)).astype(np.float32),
    )

    extr, intr = random_cameras(3, RES, seed=0)

    # synthetic "real" statistics pickle in the reference format
    rng = np.random.default_rng(2)
    proj = np.random.default_rng(0).normal(size=(RES * RES * 3, 8)).astype(np.float32)
    real_imgs = rng.uniform(0, 1, (20, RES, RES, 3)).astype(np.float32)
    real_feats = real_imgs.reshape(20, -1) @ proj
    pkl_path = str(tmp_path / "inception_stats.pkl")
    with open(pkl_path, "wb") as f:
        pickle.dump({"mean": real_feats.mean(0),
                     "cov": np.cov(real_feats, rowvar=False),
                     "feats_np": real_feats}, f)

    ev = DiffusionEvaluation(
        out_dir=str(tmp_path / "eval"),
        num_samples=2,
        poses=extr, intrinsics=intr,
        inception_pkl_path=pkl_path,
        feature_extractor="random_projection:8",
        generate_batch_size=2,
        render_pose_batch=2,
        resolution=RES,
        verbose=False,
    )
    results = ev(npcd, pn_params, dstate, rng=jax.random.PRNGKey(3),
                 num_qualitatives=1)

    assert np.isfinite(results["fid"]) and results["fid"] >= 0
    assert np.isfinite(results["kid"])
    assert osp.exists(tmp_path / "eval" / "results.pickle")
    assert osp.exists(tmp_path / "eval" / "results.csv")
    assert osp.exists(tmp_path / "eval" / "sample0000.png")

    # idempotent skip returns the stored results without recomputing
    again = ev(npcd, pn_params, dstate, rng=jax.random.PRNGKey(99))
    pd.testing.assert_series_equal(results, again)

    # the overlapped extractor (worker thread feeding Inception while the
    # next render group runs — the default) must be metric-identical to
    # the serial path: same feeds, same order, only the timing overlaps
    serial = DiffusionEvaluation(
        out_dir=None,
        num_samples=2,
        poses=extr, intrinsics=intr,
        inception_pkl_path=pkl_path,
        feature_extractor="random_projection:8",
        generate_batch_size=2,
        render_pose_batch=2,
        resolution=RES,
        verbose=False,
        overlap_extraction=False,
    )(npcd, pn_params, dstate, rng=jax.random.PRNGKey(3),
      num_qualitatives=0)
    assert serial["fid"] == results["fid"]


def test_diffusion_evaluation_device_resident_extractor(tmp_path):
    """An extractor with device_resident=True must be fed jax arrays
    (renders stay on device: device-side quantization, no bulk D2H) and
    produce the identical metric to the host-numpy feed path."""
    npcd = _tiny_npcd()
    pn_params = npcd.pointnerf.init_params(jax.random.PRNGKey(0))
    coords = jax.random.uniform(jax.random.PRNGKey(1), (4, P, 3),
                                minval=-0.4, maxval=0.4)
    pn_params = npcd.pointnerf.set_all_coords(pn_params, coords)
    dstate = npcd.diffusion.init(jax.random.PRNGKey(2))
    dstate = npcd.diffusion.fit_normalizers(
        dstate,
        np.random.default_rng(0).normal(size=(3, 256)).astype(np.float32),
        np.random.default_rng(1).normal(size=(FD, 256)).astype(np.float32),
    )
    extr, intr = random_cameras(3, RES, seed=0)

    rng = np.random.default_rng(2)
    proj = np.random.default_rng(0).normal(
        size=(RES * RES * 3, 8)).astype(np.float32)
    real_imgs = rng.uniform(0, 1, (20, RES, RES, 3)).astype(np.float32)
    real_feats = real_imgs.reshape(20, -1) @ proj
    pkl_path = str(tmp_path / "inception_stats.pkl")
    with open(pkl_path, "wb") as f:
        pickle.dump({"mean": real_feats.mean(0),
                     "cov": np.cov(real_feats, rowvar=False),
                     "feats_np": real_feats}, f)

    class DeviceProjExtractor:
        device_resident = True
        feature_dim = 8
        saw_device_input = False

        def __call__(self, images):
            assert isinstance(images, jax.Array), (
                "device_resident extractor must receive device arrays")
            DeviceProjExtractor.saw_device_input = True
            return np.asarray(images).reshape(images.shape[0], -1) @ proj

    kw = dict(
        num_samples=2,
        poses=extr, intrinsics=intr,
        inception_pkl_path=pkl_path,
        generate_batch_size=2,
        render_pose_batch=2,
        resolution=RES,
        verbose=False,
    )
    dev = DiffusionEvaluation(
        out_dir=str(tmp_path / "eval_dev"),
        feature_extractor=DeviceProjExtractor(), **kw)(
        npcd, pn_params, dstate, rng=jax.random.PRNGKey(3),
        num_qualitatives=1)
    assert DeviceProjExtractor.saw_device_input
    assert osp.exists(tmp_path / "eval_dev" / "sample0000.png")
    host = DiffusionEvaluation(
        out_dir=None, feature_extractor="random_projection:8", **kw)(
        npcd, pn_params, dstate, rng=jax.random.PRNGKey(3),
        num_qualitatives=0)
    np.testing.assert_allclose(dev["fid"], host["fid"], rtol=1e-5, atol=1e-6)
    # KID's subset sampler is freshly seeded per summary() call, so only
    # finiteness is deterministic across runs (cf. test_diffusion_evaluation_e2e)
    assert np.isfinite(dev["kid"])


def test_diffusion_evaluation_mesh_dp_matches_single(tmp_path):
    """DP eval over the 8 fake devices ('data' mesh: sharded sampler +
    renderer) produces the same FID/KID as the unsharded pipeline on the
    same rng — GSPMD partitioning is semantics-preserving."""
    from npcd_tpu.parallel import make_mesh

    npcd = _tiny_npcd()
    pn_params = npcd.pointnerf.init_params(jax.random.PRNGKey(0))
    coords = jax.random.uniform(jax.random.PRNGKey(1), (4, P, 3),
                                minval=-0.4, maxval=0.4)
    pn_params = npcd.pointnerf.set_all_coords(pn_params, coords)
    dstate = npcd.diffusion.init(jax.random.PRNGKey(2))
    dstate = npcd.diffusion.fit_normalizers(
        dstate,
        np.random.default_rng(0).normal(size=(3, 256)).astype(np.float32),
        np.random.default_rng(1).normal(size=(FD, 256)).astype(np.float32),
    )
    extr, intr = random_cameras(3, RES, seed=0)

    rng = np.random.default_rng(2)
    proj = np.random.default_rng(0).normal(size=(RES * RES * 3, 8)).astype(np.float32)
    real_imgs = rng.uniform(0, 1, (20, RES, RES, 3)).astype(np.float32)
    real_feats = real_imgs.reshape(20, -1) @ proj
    pkl_path = str(tmp_path / "inception_stats.pkl")
    with open(pkl_path, "wb") as f:
        pickle.dump({"mean": real_feats.mean(0),
                     "cov": np.cov(real_feats, rowvar=False),
                     "feats_np": real_feats}, f)

    kw = dict(
        num_samples=8,
        poses=extr, intrinsics=intr,
        inception_pkl_path=pkl_path,
        feature_extractor="random_projection:8",
        generate_batch_size=8,
        render_pose_batch=2,
        render_object_batch=8,
        resolution=RES,
        verbose=False,
    )
    base = DiffusionEvaluation(**kw)(
        npcd, pn_params, dstate, rng=jax.random.PRNGKey(3))
    mesh = make_mesh()
    assert mesh.devices.size == 8  # conftest forces 8 fake CPU devices
    dp = DiffusionEvaluation(mesh=mesh, **kw)(
        npcd, pn_params, dstate, rng=jax.random.PRNGKey(3))

    # same protocol, same rng; sharded reductions may reorder float sums
    np.testing.assert_allclose(dp["fid"], base["fid"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(dp["kid"], base["kid"], rtol=1e-4, atol=1e-5)


def test_diffusion_evaluation_mesh_rounds_batches():
    """Indivisible batch sizes are rounded up to device-count multiples."""
    from npcd_tpu.parallel import make_mesh

    extr, intr = random_cameras(2, RES, seed=0)
    ev = DiffusionEvaluation(
        num_samples=4, poses=extr, intrinsics=intr,
        feature_extractor="random_projection:8",
        generate_batch_size=3, render_object_batch=2, resolution=RES,
        mesh=make_mesh(),
    )
    assert ev.generate_batch_size % 8 == 0
    assert ev.render_object_batch % 8 == 0


def test_pointnerf_evaluation_outputs(tmp_path):
    ds = create_dataset("SyntheticNPCTrain", n_obj=4, num_views=2,
                        image_size=RES, num_points=P)
    opts = pointnerf_default_options(num_points=P, feat_dim=FD)
    opts = dataclasses.replace(
        opts,
        renderer=dataclasses.replace(opts.renderer, depth_resolution=16,
                                     ray_subsamples=24),
        aggregator=dataclasses.replace(opts.aggregator, max_shading_pts=6),
        default_resolution=RES,
    )
    pn = PointNeRF(n_obj=4, feats_dim=FD, num_points=P, opts=opts,
                   render_config=PointNeRFRenderConfig(eval_ray_chunk=256))
    params = pn.init_params(jax.random.PRNGKey(0))
    params = pn.set_all_coords(params, ds.get_all_coords())

    ev = PointNeRFEvaluation(str(tmp_path / "eval"), eval_batch_size=1,
                             verbose=False)
    df = ev(ds, pn, params, samples=2, qualitatives=1, resolution=RES)

    assert len(df) == 2 * 2  # 2 objects x 2 views
    assert np.isfinite(df["psnr"]).all()
    assert osp.exists(tmp_path / "eval" / "results.csv")
    assert osp.exists(tmp_path / "eval" / "summary.csv")
    summary = pd.read_csv(tmp_path / "eval" / "summary.csv")
    assert np.isfinite(summary["psnr"][0])

    # idempotent skip
    df2 = ev(ds, pn, params, samples=2, resolution=RES)
    pd.testing.assert_frame_equal(df, df2)


def test_pointnerf_evaluation_mesh_dp_matches_single():
    """View-sharded PSNR eval over the 8 fake devices equals the
    single-device run (params replicated, cameras sharded on the view dim)."""
    from npcd_tpu.parallel import make_mesh

    ds = create_dataset("SyntheticNPCTrain", n_obj=2, num_views=8,
                        image_size=RES, num_points=P)
    opts = pointnerf_default_options(num_points=P, feat_dim=FD)
    opts = dataclasses.replace(
        opts,
        renderer=dataclasses.replace(opts.renderer, depth_resolution=16,
                                     ray_subsamples=24),
        aggregator=dataclasses.replace(opts.aggregator, max_shading_pts=6),
        default_resolution=RES,
    )
    pn = PointNeRF(n_obj=2, feats_dim=FD, num_points=P, opts=opts,
                   render_config=PointNeRFRenderConfig(eval_ray_chunk=256))
    params = pn.init_params(jax.random.PRNGKey(0))
    params = pn.set_all_coords(params, ds.get_all_coords())

    base = PointNeRFEvaluation(eval_batch_size=8, verbose=False)(
        ds, pn, params, samples=2, resolution=RES)
    mesh = make_mesh()
    dp = PointNeRFEvaluation(eval_batch_size=8, verbose=False, mesh=mesh)(
        ds, pn, params, samples=2, resolution=RES)

    np.testing.assert_allclose(dp["psnr"], base["psnr"], rtol=1e-5, atol=1e-5)


def test_inception_feed_contract():
    """The tensor handed to the TorchScript graph must be NCHW uint8 with
    values exactly round(img*255) for 255-level-quantized images — the
    mmgen/stylegan2-ada feed the published FID-28.6 statistics assume."""
    torch = pytest.importorskip("torch")

    captured = {}

    class FakeTS:
        def __call__(self, x, return_features=False):
            captured["x"] = x
            return torch.zeros((x.shape[0], 4))

    extractor = TorchScriptInceptionExtractor(model=FakeTS())

    rng = np.random.default_rng(0)
    levels = rng.integers(0, 256, (2, 8, 8, 3))
    images = (levels / 255.0).astype(np.float32)  # 255-level quantized [0,1]
    feats = extractor(images)

    x = captured["x"]
    assert feats.shape == (2, 4)
    assert x.dtype == torch.uint8  # mmgen StyleGAN feed_op dtype
    assert x.shape == (2, 3, 8, 8)  # NCHW
    np.testing.assert_array_equal(
        x.numpy(), levels.transpose(0, 3, 1, 2).astype(np.uint8)
    )


def test_fid_eval_bf16_render(tmp_path):
    """render_dtype='bfloat16' (the qualified FID-render speed option) runs
    the same protocol and agrees with the f32 render far above the uint8
    quantization floor the protocol applies before Inception: cross-PSNR of
    the rendered views > 40 dB and the FID delta is a small fraction of the
    (synthetic) FID magnitude."""
    npcd = _tiny_npcd()
    pn_params = npcd.pointnerf.init_params(jax.random.PRNGKey(0))
    coords = jax.random.uniform(jax.random.PRNGKey(1), (4, P, 3),
                                minval=-0.4, maxval=0.4)
    pn_params = npcd.pointnerf.set_all_coords(pn_params, coords)
    dstate = npcd.diffusion.init(jax.random.PRNGKey(2))
    dstate = npcd.diffusion.fit_normalizers(
        dstate,
        np.random.default_rng(0).normal(size=(3, 256)).astype(np.float32),
        np.random.default_rng(1).normal(size=(FD, 256)).astype(np.float32),
    )
    extr, intr = random_cameras(2, RES, seed=0)

    # direct render cross-check on an explicit cloud
    import dataclasses as _dc
    import copy as _copy

    c = jax.random.uniform(jax.random.PRNGKey(5), (1, P, 3),
                           minval=-0.4, maxval=0.4)
    f = jax.random.normal(jax.random.PRNGKey(6), (1, P, FD)) * 0.1
    e = jnp.asarray(extr)[None]
    i = jnp.asarray(intr)[None]
    out32 = npcd.pointnerf.render(pn_params, c, f, e, i, resolution=RES)
    pn16 = _copy.copy(npcd.pointnerf)
    pn16.cfg = _dc.replace(pn16.cfg, compute_dtype=jnp.bfloat16)
    out16 = pn16.render(pn_params, c, f, e, i, resolution=RES)
    a = np.asarray(out32["channels"], np.float32)
    b = np.asarray(out16["channels"], np.float32)
    mse = float(np.mean((a - b) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 40, psnr

    # e2e: same protocol, bf16 render path
    rng = np.random.default_rng(2)
    proj = np.random.default_rng(0).normal(
        size=(RES * RES * 3, 8)).astype(np.float32)
    real_imgs = rng.uniform(0, 1, (20, RES, RES, 3)).astype(np.float32)
    real_feats = real_imgs.reshape(20, -1) @ proj
    pkl_path = str(tmp_path / "inception_stats.pkl")
    with open(pkl_path, "wb") as fh:
        pickle.dump({"mean": real_feats.mean(0),
                     "cov": np.cov(real_feats, rowvar=False),
                     "feats_np": real_feats}, fh)
    kw = dict(
        num_samples=2, poses=extr, intrinsics=intr,
        inception_pkl_path=pkl_path,
        feature_extractor="random_projection:8",
        generate_batch_size=2, render_pose_batch=2,
        resolution=RES, verbose=False,
    )
    r32 = DiffusionEvaluation(out_dir=str(tmp_path / "e32"), **kw)(
        npcd, pn_params, dstate, rng=jax.random.PRNGKey(3),
        num_qualitatives=0)
    r16 = DiffusionEvaluation(out_dir=str(tmp_path / "e16"),
                              render_dtype="bfloat16", **kw)(
        npcd, pn_params, dstate, rng=jax.random.PRNGKey(3),
        num_qualitatives=0)
    assert np.isfinite(r16["fid"])
    assert abs(r16["fid"] - r32["fid"]) < 0.05 * max(abs(r32["fid"]), 1.0), (
        r16["fid"], r32["fid"])
