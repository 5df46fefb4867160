"""Image/array visualization helpers.

Rebuild of the reference vis utilities (npcd/utils/vis.py): array/image ->
PIL with value-range handling, colormaps for scalar maps (depth), text and
label overlays, invalid-value marking, batch tiling (column/row-wise with
size equalization), and output-format conversion. The dispatching entry
point `vis(arr)` mirrors the reference's shape conventions
(vis.py:158-189): 2D arrays, [3, H, W] images, and batches of either.

Used by the qualitative outputs of both evaluation pipelines and by the
tensorboard/wandb image writers.
"""
from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import numpy as np

_TURBO_ANCHORS = np.array(
    [
        [48, 18, 59], [70, 107, 227], [40, 188, 235], [36, 240, 148],
        [149, 251, 81], [237, 207, 57], [251, 128, 38], [219, 56, 28],
        [122, 4, 3],
    ],
    dtype=np.float32,
)
_GRAY_ANCHORS = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.float32)
_CMAPS = {"turbo": _TURBO_ANCHORS, "gray": _GRAY_ANCHORS}


def _to_np(arr) -> np.ndarray:
    if hasattr(arr, "device_buffer") or type(arr).__module__.startswith("jax"):
        arr = np.asarray(arr)
    if hasattr(arr, "detach"):  # torch tensor
        arr = arr.detach().cpu().numpy()
    return np.asarray(arr, np.float32)


def _colormap(x: np.ndarray, cmap: str = "turbo") -> np.ndarray:
    """x in [0, 1] -> RGB in [0, 1] via piecewise-linear anchor blending."""
    anchors = _CMAPS[cmap]
    x = np.clip(x, 0.0, 1.0)
    pos = x * (len(anchors) - 1)
    lo = np.floor(pos).astype(int)
    hi = np.minimum(lo + 1, len(anchors) - 1)
    frac = (pos - lo)[..., None]
    return (anchors[lo] * (1 - frac) + anchors[hi] * frac) / 255.0


def invalidate_np_array(
    arr: np.ndarray,
    clipping: bool = False,
    upper_clipping_thresh: Optional[float] = None,
    lower_clipping_thresh: Optional[float] = None,
    invalid_values: Optional[Sequence[float]] = None,
) -> np.ndarray:
    """NaN-out invalid/clipped entries (reference vis.py:642-676)."""
    arr = np.array(arr, np.float32, copy=True)
    if invalid_values is not None:
        for v in invalid_values:
            arr[arr == v] = np.nan
    arr[~np.isfinite(arr)] = np.nan
    if clipping:
        if upper_clipping_thresh is not None:
            arr[arr > upper_clipping_thresh] = np.nan
        if lower_clipping_thresh is not None:
            arr[arr < lower_clipping_thresh] = np.nan
    return arr


def add_text_to_img(img, text: str, pos=(2, 2), color=(255, 255, 255),
                    size: Optional[int] = None, background: bool = True):
    """Draw `text` onto a PIL image (reference vis.py:543-...); best-effort
    default font."""
    from PIL import ImageDraw

    draw = ImageDraw.Draw(img)
    font = None
    if size is not None:
        try:
            from PIL import ImageFont

            font = ImageFont.load_default(size=size)
        except Exception:
            font = None
    if background:
        bbox = draw.textbbox(pos, text, font=font)
        draw.rectangle(bbox, fill=(0, 0, 0))
    draw.text(pos, text, fill=color, font=font)
    return img


def _equalize_sizes(imgs):
    """Pad PIL images to a common size (reference vis.py:122-136)."""
    from PIL import Image

    w = max(i.width for i in imgs)
    h = max(i.height for i in imgs)
    out = []
    for i in imgs:
        if i.size == (w, h):
            out.append(i)
        else:
            canvas = Image.new("RGB", (w, h))
            canvas.paste(i, (0, 0))
            out.append(canvas)
    return out


def cat_images_colwise(imgs):
    """Concatenate PIL images side by side (reference vis.py:138-146)."""
    from PIL import Image

    imgs = _equalize_sizes(list(imgs))
    w, h = imgs[0].size
    canvas = Image.new("RGB", (w * len(imgs), h))
    for i, im in enumerate(imgs):
        canvas.paste(im, (i * w, 0))
    return canvas


def cat_images_rowwise(imgs):
    """Concatenate PIL images top to bottom (reference vis.py:148-156)."""
    from PIL import Image

    imgs = _equalize_sizes(list(imgs))
    w, h = imgs[0].size
    canvas = Image.new("RGB", (w, h * len(imgs)))
    for i, im in enumerate(imgs):
        canvas.paste(im, (0, i * h))
    return canvas


def _finish(img, text, label, text_off, out_format, out_action=None,
            range_colors=None):
    if not text_off:
        overlays = [t for t in (label, text) if t]
        if overlays:
            add_text_to_img(img, " | ".join(overlays))
        if range_colors is not None:
            # colored min/max swatches next to the range text (reference
            # vis.py:33-84 _cmap_min_str/_cmap_max_str intent): a 6x6 patch
            # in the colormap's extreme colors at the top-right corner
            from PIL import ImageDraw

            draw = ImageDraw.Draw(img)
            lo_c, hi_c = range_colors
            w = img.width
            draw.rectangle([w - 14, 2, w - 9, 8], fill=tuple(lo_c))
            draw.rectangle([w - 7, 2, w - 2, 8], fill=tuple(hi_c))
    out = img
    if isinstance(out_format, dict):
        # reference contract (vis.py:97-104): {'type': 'PIL'|'np',
        # 'dtype': ...}; 'np' returns CHW
        if out_format.get("type") == "np":
            out = np.array(img, dtype=out_format.get("dtype")).transpose(2, 0, 1)
    elif out_format in ("np", "numpy"):
        out = np.asarray(img, np.uint8)
    if out_action is not None:
        # reference contract (vis.py:105-119): dict {'type': 'save',
        # 'path': ...} or the string 'show'
        if isinstance(out_action, dict) and out_action.get("type") == "save":
            if isinstance(out, np.ndarray):
                np.save(out_action["path"], out)
            else:
                out.save(out_action["path"])
        elif out_action == "show":
            img.show()
    return out


def _vis_single_2d_array(
    arr: np.ndarray,
    colorize: bool = True,
    clipping: bool = False,
    upper_clipping_thresh: Optional[float] = None,
    lower_clipping_thresh: Optional[float] = None,
    mark_clipping: bool = False,
    clipping_color=None,
    invalid_values: Optional[Sequence[float]] = None,
    mark_invalid: bool = False,
    invalid_color=(128, 128, 128),
    text: Optional[str] = None,
    label: Optional[str] = None,
    cmap: str = "turbo",
    image_range_text_off: bool = False,
    image_range_colors_off: bool = False,
    text_off: bool = False,
    out_format=None,
    out_action=None,
):
    """Scalar 2D map -> colorized PIL image with range annotation
    (reference vis.py:253-388). mark_clipping paints values beyond the
    clipping thresholds in clipping_color (default: the colormap's extreme
    colors, per threshold side); out_format/out_action follow the
    reference dict contracts (vis.py:97-119)."""
    from PIL import Image

    raw = np.array(_to_np(arr), np.float32, copy=True)
    arr = invalidate_np_array(
        raw, clipping, upper_clipping_thresh, lower_clipping_thresh,
        invalid_values,
    )
    finite = np.isfinite(arr)
    lo = float(np.nanmin(arr)) if finite.any() else 0.0
    hi = float(np.nanmax(arr)) if finite.any() else 1.0
    normed = (arr - lo) / (hi - lo) if hi > lo else np.zeros_like(arr)
    normed = np.nan_to_num(normed, nan=0.0)

    rgb = _colormap(normed, cmap) if colorize else np.repeat(normed[..., None], 3, -1)
    if mark_invalid:
        rgb[~finite] = np.asarray(invalid_color, np.float32) / 255.0
    if clipping and mark_clipping:
        cmap_lo = (_colormap(np.zeros(()), cmap) if colorize
                   else np.zeros(3)) * 255.0
        cmap_hi = (_colormap(np.ones(()), cmap) if colorize
                   else np.ones(3)) * 255.0
        hi_col = np.asarray(clipping_color if clipping_color is not None
                            else cmap_hi, np.float32) / 255.0
        lo_col = np.asarray(clipping_color if clipping_color is not None
                            else cmap_lo, np.float32) / 255.0
        raw_finite = np.isfinite(raw)
        if upper_clipping_thresh is not None:
            rgb[raw_finite & (raw > upper_clipping_thresh)] = hi_col
        if lower_clipping_thresh is not None:
            rgb[raw_finite & (raw < lower_clipping_thresh)] = lo_col
    img = Image.fromarray((np.clip(rgb, 0, 1) * 255).astype(np.uint8))

    range_colors = None
    if not image_range_text_off and not text_off:
        range_text = f"[{lo:.3g}, {hi:.3g}]"
        text = f"{text} {range_text}" if text else range_text
        if colorize and not image_range_colors_off:
            range_colors = (
                tuple((_colormap(np.zeros(()), cmap) * 255).astype(np.uint8)),
                tuple((_colormap(np.ones(()), cmap) * 255).astype(np.uint8)),
            )
    return _finish(img, text, label, text_off, out_format, out_action,
                   range_colors)


def _vis_single_image(
    img: np.ndarray,
    clipping: bool = True,
    upper_clipping_thresh: Optional[float] = 1.0,
    lower_clipping_thresh: Optional[float] = 0.0,
    invalid_values: Optional[Sequence[float]] = None,
    mark_invalid: bool = False,
    invalid_color=(128, 128, 128),
    text: Optional[str] = None,
    label: Optional[str] = None,
    text_off: bool = True,
    out_format=None,
    out_action=None,
):
    """[3, H, W] or [H, W, 3] float image in [0, 1] -> PIL
    (reference vis.py:434-541); out_format/out_action per the reference
    dict contracts (vis.py:97-119)."""
    from PIL import Image

    img = _to_np(img)
    if img.ndim == 3 and img.shape[0] == 3 and img.shape[-1] != 3:
        img = np.moveaxis(img, 0, -1)
    invalid = ~np.isfinite(img).all(-1)
    if invalid_values is not None:
        for v in invalid_values:
            invalid |= (img == v).all(-1)
    img = np.nan_to_num(img, nan=0.0, posinf=1.0, neginf=0.0)
    if clipping:
        img = np.clip(img, lower_clipping_thresh, upper_clipping_thresh)
    if mark_invalid:
        img = img.copy()
        img[invalid] = np.asarray(invalid_color, np.float32) / 255.0
    pil = Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8))
    return _finish(pil, text, label, text_off, out_format, out_action)


def _vis_batch(singles_fn, arr, full_batch, batch_labels, **kwargs):
    if not full_batch:
        return singles_fn(arr[0], **kwargs)
    imgs = []
    for idx, ele in enumerate(arr):
        kw = dict(kwargs)
        if batch_labels is not None:
            kw["label"] = batch_labels[idx]
        imgs.append(singles_fn(ele, **kw))
    return cat_images_rowwise(imgs) if full_batch == "rows" else cat_images_colwise(imgs)


def vis_2d_array(arr, full_batch=False, batch_labels=None, **kwargs):
    """2D array or batch thereof -> PIL (reference vis.py:211-251).

    full_batch: False = first sample only; True/'cols' = side-by-side;
    'rows' = stacked vertically."""
    arr = _to_np(arr)
    assert 2 <= arr.ndim <= 4, arr.shape
    if arr.ndim == 4:
        assert arr.shape[1] == 1, arr.shape
        arr = arr[:, 0]
    if arr.ndim == 2:
        return _vis_single_2d_array(arr, **kwargs)
    return _vis_batch(_vis_single_2d_array, arr, full_batch, batch_labels, **kwargs)


def vis_image(img, full_batch=False, batch_labels=None, **kwargs):
    """[3, H, W]/[H, W, 3] image or batch -> PIL (reference vis.py:390-432)."""
    img = _to_np(img)
    assert 3 <= img.ndim <= 4, img.shape
    if img.ndim == 3:
        return _vis_single_image(img, **kwargs)
    return _vis_batch(_vis_single_image, img, full_batch, batch_labels, **kwargs)


def vis(arr, **kwargs):
    """Shape-dispatching visualization (reference vis.py:158-189):
    2D -> scalar map; [3, H, W] -> image; batches of either."""
    arr = _to_np(arr)
    if arr.ndim == 2:
        return vis_2d_array(arr, **kwargs)
    if arr.ndim == 3:
        return vis_image(arr, **kwargs) if arr.shape[0] == 3 else vis_2d_array(arr, **kwargs)
    if arr.ndim == 4:
        if arr.shape[1] == 3:
            return vis_image(arr, **kwargs)
        assert arr.shape[1] == 1, f"cannot visualize shape {arr.shape}"
        return vis_2d_array(arr, **kwargs)
    raise ValueError(f"cannot visualize shape {arr.shape}")


def check_vis(arr) -> bool:
    """Whether vis() can handle the array shape (reference vis.py:193-209)."""
    nd = np.ndim(arr)
    if nd in (2, 3):
        return True
    if nd == 4:
        return np.shape(arr)[1] in (1, 3)
    return False


def vis_kp_attribution(kp_weights, resolution: Optional[int] = None) -> np.ndarray:
    """Visualize composited per-keypoint weights (PointNeRF.render
    kp_weights=True output, one view: [R, P] or [H, W, P]).

    Each pixel is colored by the keypoint that dominates its ray (turbo
    colormap over keypoint index, a stable pseudo-random hue per point) and
    scaled by the total composited weight, so background rays stay dark and
    each surface region shows which neural point it is attributed to.
    Returns [H, W, 3] float RGB in [0, 1]."""
    w = _to_np(kp_weights)
    if w.ndim == 2:
        if resolution is None:
            resolution = int(math.isqrt(w.shape[0]))
            if resolution * resolution != w.shape[0]:
                raise ValueError(
                    f"cannot infer a square resolution from {w.shape[0]} rays; "
                    "pass resolution="
                )
        w = w.reshape(resolution, resolution, -1)
    num_kp = w.shape[-1]
    top = np.argmax(w, axis=-1)  # [H, W]
    total = np.clip(w.sum(axis=-1), 0.0, 1.0)  # [H, W]
    # decorrelate adjacent keypoint ids so neighboring points get distinct hues
    hue = ((top * 2654435761) % num_kp) / max(num_kp - 1, 1)
    return _colormap(hue) * total[..., None]


def tile_images(images: Sequence[np.ndarray], cols: Optional[int] = None) -> np.ndarray:
    """Stack a list of same-shaped [H, W, 3] arrays into one grid image."""
    images = [_to_np(im) for im in images]
    n = len(images)
    cols = cols or math.ceil(math.sqrt(n))
    rows = math.ceil(n / cols)
    h, w, c = images[0].shape
    grid = np.ones((rows * h, cols * w, c), np.float32)
    for i, im in enumerate(images):
        r, col = divmod(i, cols)
        grid[r * h:(r + 1) * h, col * w:(col + 1) * w] = im
    return grid
