"""Smoke test for the generation CLI (tools/generate_samples.py): load a
weights checkpoint, sample point clouds (with trajectory), render PNGs."""
import os.path as osp
import sys

import jax
import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))


def test_generate_samples_cli(tmp_path):
    from npcd_tpu.data.synthetic import random_cameras
    from npcd_tpu.models.npcd import NPCD
    from npcd_tpu.utils import load_config
    from npcd_tpu.utils.checkpoint import save_weights_only
    from tools.generate_samples import main

    config = load_config("configs/npcd_synthetic_tiny.yaml")
    model = NPCD.from_config(config)
    params = model.init_params(jax.random.PRNGKey(0))
    params["diffusion"] = model.diffusion.fit_normalizers(
        params["diffusion"],
        np.random.default_rng(0).normal(size=(3, 128)).astype(np.float32),
        np.random.default_rng(1).normal(size=(8, 128)).astype(np.float32),
    )
    weights = str(tmp_path / "weights")
    save_weights_only(weights, params)

    extr, intr = random_cameras(3, 16, seed=0)
    np.save(tmp_path / "poses.npy", np.asarray(extr))
    np.save(tmp_path / "intrinsics.npy", np.asarray(intr))

    out = str(tmp_path / "gen")
    main([
        "--config", "configs/npcd_synthetic_tiny.yaml",
        "--weights", weights,
        "--out", out,
        "--num", "2", "--batch-size", "2", "--seed", "0",
        "--trajectory-stride", "50",
        "--render", "1",
        "--swap", "2",
        "--poses", str(tmp_path / "poses.npy"),
        "--intrinsics", str(tmp_path / "intrinsics.npy"),
        "--render-poses", "2", "--resolution", "16",
    ])

    data = np.load(osp.join(out, "samples.npz"))
    assert data["coords"].shape == (2, 3, 32)
    assert data["feats"].shape == (2, 8, 32)
    assert np.isfinite(data["coords"]).all()
    # K+1 collected states along axis 0, batch on axis 1
    assert data["trajectory_coords"].shape[1] == 2
    assert data["trajectory_coords"].shape[-1] == 32
    assert osp.exists(osp.join(out, "sample0000.png"))
    # disentanglement demo: 2x2 shape x appearance cross grid
    from PIL import Image

    grid = Image.open(osp.join(out, "swap_grid.png"))
    assert grid.size == (2 * 16, 2 * 16)
