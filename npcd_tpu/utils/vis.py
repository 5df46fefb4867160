"""Image/array visualization helpers.

Rebuild of the reference vis utilities (npcd/utils/vis.py): tensor -> PIL
image with value-range handling, optional colormap for scalar maps (depth),
and batch tiling into image grids. Used by qualitative eval outputs and the
tensorboard writer.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import numpy as np


def _to_hwc(arr: np.ndarray) -> np.ndarray:
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[..., None]
    if arr.ndim == 3 and arr.shape[0] in (1, 3) and arr.shape[-1] not in (1, 3):
        arr = np.moveaxis(arr, 0, -1)  # CHW -> HWC
    return arr


_TURBO_ANCHORS = np.array(
    [
        [48, 18, 59], [70, 107, 227], [40, 188, 235], [36, 240, 148],
        [149, 251, 81], [237, 207, 57], [251, 128, 38], [219, 56, 28],
        [122, 4, 3],
    ],
    dtype=np.float32,
)


def _colormap(x: np.ndarray) -> np.ndarray:
    """x in [0, 1] -> RGB via a compact turbo-like colormap."""
    x = np.clip(x, 0.0, 1.0)
    pos = x * (len(_TURBO_ANCHORS) - 1)
    lo = np.floor(pos).astype(int)
    hi = np.minimum(lo + 1, len(_TURBO_ANCHORS) - 1)
    frac = (pos - lo)[..., None]
    return (_TURBO_ANCHORS[lo] * (1 - frac) + _TURBO_ANCHORS[hi] * frac) / 255.0


def vis(
    image: np.ndarray,
    clipping: bool = True,
    lower_clipping_thresh: Optional[float] = None,
    upper_clipping_thresh: Optional[float] = None,
    colorize_scalar: bool = True,
):
    """Array -> PIL.Image. image: [H, W], [H, W, 1|3] or [1|3, H, W] float."""
    from PIL import Image

    arr = _to_hwc(np.asarray(image, np.float32))
    lo = lower_clipping_thresh if lower_clipping_thresh is not None else float(np.nanmin(arr))
    hi = upper_clipping_thresh if upper_clipping_thresh is not None else float(np.nanmax(arr))
    if clipping:
        arr = np.clip(arr, lo, hi)
    if hi > lo:
        normed = (arr - lo) / (hi - lo) if (lo, hi) != (0.0, 1.0) else arr
    else:
        normed = np.zeros_like(arr)

    if arr.shape[-1] == 1:
        rgb = _colormap(normed[..., 0]) if colorize_scalar else np.repeat(normed, 3, -1)
    else:
        rgb = normed
    return Image.fromarray((np.clip(rgb, 0, 1) * 255).astype(np.uint8))


def tile_images(images: Sequence[np.ndarray], cols: Optional[int] = None) -> np.ndarray:
    """Stack a list of same-shaped [H, W, 3] arrays into one grid image."""
    images = [np.asarray(_to_hwc(im), np.float32) for im in images]
    n = len(images)
    cols = cols or math.ceil(math.sqrt(n))
    rows = math.ceil(n / cols)
    h, w, c = images[0].shape
    grid = np.ones((rows * h, cols * w, c), np.float32)
    for i, im in enumerate(images):
        r, col = divmod(i, cols)
        grid[r * h:(r + 1) * h, col * w:(col + 1) * w] = im
    return grid
