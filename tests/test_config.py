"""Config loading tests: reference YAML schema incl. !!python/tuple."""
import textwrap

from npcd_tpu.utils.config import load_config, pointnerf_default_options


def test_load_reference_schema(tmp_path):
    yaml_text = textwrap.dedent(
        """
        train_dataset: SRNCarsTrain
        model:
            n_obj: 2347
            coords_dim: 3
            feats_dim: 32
            num_points: 512
            use_view_dir: False
            width: 1024
            layers: 24
            heads: 16
        diffusion_training:
            batch_size: 32
            use_ema: True
            ema_params:
                - !!python/tuple [1, 0.9999, 0.9999, False]
        """
    )
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml_text)
    cfg = load_config(str(p))
    assert cfg.train_dataset == "SRNCarsTrain"
    assert cfg.model.n_obj == 2347
    assert cfg.model.width == 1024
    ema = cfg.diffusion_training.ema_params[0]
    assert isinstance(ema, tuple)
    assert ema == (1, 0.9999, 0.9999, False)


def test_repo_config_loads():
    cfg = load_config("configs/npcd_srncars.yaml")
    assert cfg.model.n_obj == 2347
    assert cfg.pointnerf_training.batch_size == 8
    assert cfg.diffusion_training.max_iterations == 1800000


def test_default_options_match_reference_values():
    """Values mirror _get_pointnerf_options (reference pointnerf.py:134-194)."""
    o = pointnerf_default_options()
    assert o.num_points == 512 and o.feat_dim == 32
    assert o.voxel_grid.voxel_size == (0.04, 0.04, 0.04)
    assert o.voxel_grid.scaled_voxel_size == (0.08, 0.08, 0.08)
    assert o.aggregator.k == 8 and o.aggregator.r == 2
    assert o.knn_radius == 0.16
    assert o.aggregator.max_shading_pts == 50
    assert o.renderer.depth_resolution == 128
    assert o.renderer.ray_subsamples == 112
    assert o.renderer.white_back is True
    assert o.field.use_dir is False
    assert o.default_resolution == 128
