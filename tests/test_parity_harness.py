"""Offline smoke test for tools/parity_eval.py: a synthetic torch
checkpoint in the full reference state_dict layout (pointnerf FlexEmbedding
extra-state + field/aggregator Sequentials + denoiser + normalizer buffers)
is converted and driven through BOTH parity stages end-to-end — PSNR over a
synthetic dataset and generate->render->FID with the deterministic
random_projection extractor — so the harness is proven runnable before the
real assets (npcd_srncars.pt, SRN-Cars, inception-2015-12-05.pt, stats pkl)
exist in the environment."""
import pickle
import sys
import os.path as osp

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

from tools.parity_eval import convert_weights, run_fid, run_psnr  # noqa: E402

N_OBJ, P, FD, RES = 3, 16, 8, 16
W, H, LAYERS = 32, 4, 1


def _reference_checkpoint(tmp_path):
    g = torch.Generator().manual_seed(0)
    sd = {}

    def lin(name, d_in, d_out, zero=False):
        sd[f"{name}.weight"] = (
            torch.zeros(d_out, d_in) if zero
            else torch.randn(d_out, d_in, generator=g) * 0.05
        )
        sd[f"{name}.bias"] = torch.zeros(d_out)

    def ln(name, d):
        sd[f"{name}.weight"] = torch.ones(d)
        sd[f"{name}.bias"] = torch.zeros(d)

    # pointnerf: FlexEmbedding extra-state + MLP Sequentials (reference
    # flex_embedding.py:9-26, model.py:22-36)
    coords = (torch.rand(N_OBJ, P * 3, generator=g) - 0.5) * 0.8
    feats = torch.randn(N_OBJ, P * 2 * FD, generator=g) * 0.1
    sd["pointnerf.coords._extra_state"] = {"emb": {"weight": coords}}
    sd["pointnerf.feats._extra_state"] = {"emb": {"weight": feats}}
    agg_in = FD + 63  # feat_dim + posenc(3, n_freqs=10) = 3*(1+2*10)
    dims = [(agg_in, 256)] + [(256, 256)] * 4
    for i, (di, do) in enumerate(dims):
        lin(f"pointnerf.field.aggregator.local_field.{2*i}", di, do)
    lin("pointnerf.field.shape_net.0", 256, 256)
    lin("pointnerf.field.shape_net.2", 256, 1)
    for i, (di, do) in enumerate([(256, 256)] * 4 + [(256, 3)]):
        lin(f"pointnerf.field.channel_net.{2*i}", di, do)

    # denoiser (reference transformer.py naming)
    pre = "diffusion.denoiser."
    lin(pre + "input_proj", 3 + FD, W)
    lin(pre + "output_proj", W, 3 + FD, zero=True)
    ln(pre + "ln_pre", W)
    ln(pre + "ln_post", W)
    lin(pre + "time_embed.c_fc", W, 4 * W)
    lin(pre + "time_embed.c_proj", 4 * W, W)
    for i in range(LAYERS):
        b = pre + f"backbone.resblocks.{i}."
        ln(b + "ln_1", W)
        ln(b + "ln_2", W)
        lin(b + "attn.c_qkv", W, 3 * W)
        lin(b + "attn.c_proj", W, W)
        lin(b + "mlp.c_fc", W, 4 * W)
        lin(b + "mlp.c_proj", 4 * W, W)

    # normalizer buffers (reference diffusion_model.py:21-38)
    for name, dim in [("coords_normalization", 3), ("feats_normalization", FD)]:
        sd[f"diffusion.{name}.shift"] = torch.zeros(dim)
        sd[f"diffusion.{name}.scale"] = torch.ones(1)
        sd[f"diffusion.{name}.min"] = torch.full((1,), -2.0)
        sd[f"diffusion.{name}.max"] = torch.full((1,), 2.0)

    path = str(tmp_path / "npcd_synthetic.pt")
    torch.save(sd, path)
    return path


def _config(tmp_path):
    from npcd_tpu.data.synthetic import random_cameras

    extr, intr = random_cameras(3, RES, seed=0)
    poses_path = str(tmp_path / "poses.npy")
    intr_path = str(tmp_path / "intrinsics.npy")
    np.save(poses_path, extr)
    np.save(intr_path, intr)
    return {
        "model": {
            "n_obj": N_OBJ, "coords_dim": 3, "feats_dim": FD,
            "num_points": P, "width": W, "layers": LAYERS, "heads": H,
        },
        "train_dataset": "SyntheticNPCTrain",
        "dataset_kwargs": {
            "n_obj": N_OBJ, "num_views": 2, "image_size": RES,
            "num_points": P, "seed": 0,
        },
        "pointnerf_options": {
            "depth_resolution": 16, "ray_subsamples": 24,
            "max_shading_pts": 6, "default_resolution": RES,
        },
        "diffusion_evaluation": {
            "num_samples": 2,
            "poses_path": poses_path,
            "intrinsics_path": intr_path,
            "resolution": RES,
        },
    }


def test_parity_harness_end_to_end(tmp_path):
    ckpt = _reference_checkpoint(tmp_path)
    config = _config(tmp_path)

    converted = convert_weights(ckpt, config)
    assert set(converted) == {"pointnerf", "diffusion"}

    psnr = run_psnr(config, converted["pointnerf"], str(tmp_path / "out"),
                    samples=2, qualitatives=0)
    assert np.isfinite(psnr)

    # synthetic real statistics in the reference pkl format
    rng = np.random.default_rng(2)
    proj = np.random.default_rng(0).normal(
        size=(RES * RES * 3, 8)).astype(np.float32)
    real = rng.uniform(0, 1, (20, RES, RES, 3)).astype(np.float32)
    real_feats = real.reshape(20, -1) @ proj
    pkl = str(tmp_path / "stats.pkl")
    with open(pkl, "wb") as f:
        pickle.dump({"mean": real_feats.mean(0),
                     "cov": np.cov(real_feats, rowvar=False),
                     "feats_np": real_feats}, f)

    fid, kid = run_fid(
        config, converted, str(tmp_path / "out"),
        inception_pkl=pkl,
        feature_extractor="random_projection:8",
        generate_batch_size=2,
    )
    assert np.isfinite(fid) and fid >= 0
    assert np.isfinite(kid)


def test_check_assets_dry_run(tmp_path):
    """tools/parity_eval.py --check-assets: a fully staged synthetic
    manifest passes; each missing/corrupt asset is reported precisely."""
    from tools.parity_eval import check_assets

    ckpt = _reference_checkpoint(tmp_path)
    config = _config(tmp_path)

    # fake SRN root laid out per the real train list's first ids
    lists_dir = osp.join(osp.dirname(__file__), "..", "npcd_tpu", "data",
                         "sample_lists")
    with open(osp.join(lists_dir, "srn_cars_train.list")) as f:
        ids = [ln.strip() for ln in f if ln.strip()][:3]
    srn_root = tmp_path / "cars_train"
    for oid in ids:
        obj = srn_root / oid
        (obj / "rgb").mkdir(parents=True)
        (obj / "pose").mkdir()
        (obj / "rgb" / "000000.png").write_bytes(b"\x89PNG fake")
        (obj / "pose" / "000000.txt").write_text("1 0 0 0\n0 1 0 0\n0 0 1 0\n0 0 0 1\n")
        (obj / "intrinsics.txt").write_text("16 0 8 8\n")
        np.savez(obj / "pointcloud3_512.npz", points=np.zeros((4, 3)))

    class TinyGraph(torch.nn.Module):
        def forward(self, x):
            return x.mean(dim=(1, 2, 3))

    ts_path = str(tmp_path / "inception.pt")
    torch.jit.save(torch.jit.script(TinyGraph()), ts_path)

    rng = np.random.default_rng(0)
    feats = rng.normal(size=(16, 2048)).astype(np.float32)
    pkl_path = str(tmp_path / "stats.pkl")
    with open(pkl_path, "wb") as f:
        pickle.dump({"mean": feats.mean(0),
                     "cov": np.cov(feats, rowvar=False),
                     "feats_np": feats}, f)

    problems = check_assets(
        weights=ckpt, srn_root=str(srn_root), inception=ts_path,
        inception_pkl=pkl_path, config=config,
    )
    assert problems == [], problems

    # missing everything -> one precise problem per asset
    problems = check_assets(
        weights=str(tmp_path / "no.pt"), srn_root=str(tmp_path / "no_dir"),
        inception=str(tmp_path / "no_inc.pt"),
        inception_pkl=str(tmp_path / "no.pkl"), config=config,
    )
    assert len(problems) == 4 and all(p.startswith("MISSING") for p in problems)

    # corrupt pkl schema
    with open(pkl_path, "wb") as f:
        pickle.dump({"mean": np.zeros(7)}, f)
    problems = check_assets(inception_pkl=pkl_path)
    assert any("missing 'cov'" in p for p in problems)
    assert any("mean shape" in p for p in problems)

    # wrong-n_obj checkpoint
    bad_cfg = dict(config, model=dict(config["model"], n_obj=N_OBJ + 5))
    problems = check_assets(weights=ckpt, config=bad_cfg)
    assert any("feats table" in p for p in problems)


def test_parity_harness_structure_mismatch_raises(tmp_path):
    ckpt = _reference_checkpoint(tmp_path)
    config = _config(tmp_path)
    converted = convert_weights(ckpt, config)
    bad = dict(config, model=dict(config["model"], num_points=P * 2))
    with pytest.raises(Exception):
        run_psnr(bad, converted["pointnerf"], None, samples=1)
