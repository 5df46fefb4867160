"""Visualization helper tests (reference npcd/utils/vis.py surface)."""
import numpy as np
import pytest

from npcd_tpu.utils.vis import (
    add_text_to_img,
    cat_images_colwise,
    cat_images_rowwise,
    check_vis,
    invalidate_np_array,
    tile_images,
    vis,
    vis_2d_array,
    vis_image,
)


def test_vis_dispatch_shapes():
    pytest.importorskip("PIL")
    assert vis(np.random.rand(8, 8)).size == (8, 8)  # 2d map
    assert vis(np.random.rand(3, 8, 8)).size == (8, 8)  # CHW image
    assert vis(np.random.rand(2, 8, 8), full_batch=True).size == (16, 8)  # batch of maps
    assert vis(np.random.rand(2, 3, 8, 8), full_batch="rows").size == (8, 16)
    assert vis(np.random.rand(2, 1, 8, 8), full_batch=True).size == (16, 8)
    with pytest.raises(ValueError):
        vis(np.random.rand(2, 2, 2, 8, 8))


def test_check_vis():
    assert check_vis(np.zeros((4, 4)))
    assert check_vis(np.zeros((3, 4, 4)))
    assert check_vis(np.zeros((2, 1, 4, 4)))
    assert not check_vis(np.zeros((2, 2, 4, 4)))
    assert not check_vis(np.zeros((5,)))


def test_vis_2d_array_colormap_and_range():
    pytest.importorskip("PIL")
    arr = np.linspace(0, 1, 64).reshape(8, 8)
    img = vis_2d_array(arr, text_off=True)
    px = np.asarray(img)
    # turbo-like: low values blue-ish, high values red-ish
    assert px[0, 0, 2] > px[0, 0, 0]
    assert px[-1, -1, 0] > px[-1, -1, 2]
    # range text overlay changes pixels vs text_off
    img_text = vis_2d_array(arr)
    assert not np.array_equal(np.asarray(img_text), px)


def test_invalidate_and_mark_invalid():
    pytest.importorskip("PIL")
    arr = np.array([[0.0, 1.0], [np.inf, -5.0]])
    out = invalidate_np_array(arr, clipping=True, lower_clipping_thresh=-1.0)
    assert np.isnan(out[1, 0]) and np.isnan(out[1, 1])
    img = vis_2d_array(arr, mark_invalid=True, invalid_color=(255, 0, 255),
                       text_off=True)
    assert tuple(np.asarray(img)[1, 0]) == (255, 0, 255)


def test_batch_labels_and_cat():
    pytest.importorskip("PIL")
    imgs = [vis_image(np.random.rand(3, 6, 6)) for _ in range(3)]
    assert cat_images_colwise(imgs).size == (18, 6)
    assert cat_images_rowwise(imgs).size == (6, 18)
    # labels render without error and batch cat sizes match
    out = vis_image(np.random.rand(2, 3, 8, 8), full_batch=True,
                    batch_labels=["a", "b"], text_off=False)
    assert out.size == (16, 8)


def test_add_text_and_tile():
    pytest.importorskip("PIL")
    img = vis_image(np.zeros((3, 16, 16)))
    before = np.asarray(img).copy()
    add_text_to_img(img, "hi")
    assert not np.array_equal(before, np.asarray(img))
    grid = tile_images([np.zeros((4, 4, 3))] * 5)
    assert grid.shape == (8, 12, 3)


def test_out_format_out_action_reference_contracts(tmp_path):
    """Reference-style dict out_format ({'type': 'np'} -> CHW array,
    vis.py:97-104) and out_action ({'type': 'save', 'path': ...},
    vis.py:105-119) round-trip."""
    import numpy as np
    from npcd_tpu.utils.vis import vis

    arr = np.linspace(0, 1, 64).reshape(8, 8)
    out = vis(arr, out_format={"type": "np", "dtype": "uint8"})
    assert isinstance(out, np.ndarray) and out.shape[0] == 3  # CHW

    p = tmp_path / "v.png"
    img = vis(arr, out_action={"type": "save", "path": str(p)})
    assert p.exists() and img.size == (8, 8)

    npy = tmp_path / "v.npy"
    vis(arr, out_format={"type": "np"}, out_action={"type": "save", "path": str(npy)})
    assert np.load(npy).shape[0] == 3


def test_mark_clipping_paints_extremes():
    """mark_clipping paints beyond-threshold pixels in the colormap's
    extreme colors (reference vis.py:253-290 semantics)."""
    import numpy as np
    from npcd_tpu.utils.vis import vis_2d_array

    arr = np.array([[0.0, 0.5, 5.0], [-5.0, 0.2, 0.8]], np.float32)
    img = vis_2d_array(
        arr, clipping=True, upper_clipping_thresh=1.0,
        lower_clipping_thresh=-1.0, mark_clipping=True, text_off=True)
    px = np.asarray(img)
    # the 5.0 pixel gets the cmap max color; -5.0 the cmap min color
    from npcd_tpu.utils.vis import _colormap
    hi = (_colormap(np.ones(())) * 255).astype(np.uint8)
    lo = (_colormap(np.zeros(())) * 255).astype(np.uint8)
    assert np.abs(px[0, 2].astype(int) - hi.astype(int)).max() <= 1
    assert np.abs(px[1, 0].astype(int) - lo.astype(int)).max() <= 1
