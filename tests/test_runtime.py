"""Native C++ runtime tests (libpng decode, collation, FPS) against
python oracles. Skipped when no toolchain is available."""
import numpy as np
import pytest

from npcd_tpu import runtime


pytestmark = pytest.mark.skipif(
    not runtime.available(), reason=f"native runtime unavailable: {runtime.build_error()}"
)


def test_png_decode_exact_at_native_size(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    img = (rng.uniform(0, 1, (48, 48, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "x.png")
    Image.fromarray(img).save(p)
    out = runtime.decode_png_batch([p], 48)
    np.testing.assert_allclose(out[0], img.astype(np.float32) / 255.0, atol=1e-6)


def test_png_decode_rgba_composites_like_rgb_convert(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(1)
    rgba = (rng.uniform(0, 1, (16, 16, 4)) * 255).astype(np.uint8)
    p = str(tmp_path / "a.png")
    Image.fromarray(rgba, "RGBA").save(p)
    out = runtime.decode_png_batch([p], 16)
    ref = np.asarray(Image.open(p).convert("RGB"), np.float32) / 255.0
    np.testing.assert_allclose(out[0], ref, atol=1e-6)


def test_collate_matches_stack():
    rng = np.random.default_rng(2)
    arrays = [rng.normal(size=(5, 7)).astype(np.float32) for _ in range(6)]
    np.testing.assert_array_equal(runtime.collate_f32(arrays), np.stack(arrays))


def test_fps_matches_numpy_oracle():
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(300, 3)).astype(np.float32)
    k = 12
    got = runtime.fps(pts, k)

    n = pts.shape[0]
    min_d2 = np.full((n,), np.inf, np.float32)
    ref = np.zeros((k,), np.int32)
    for j in range(1, k):
        d2 = np.sum((pts - pts[ref[j - 1]]) ** 2, axis=-1)
        np.minimum(min_d2, d2, out=min_d2)
        ref[j] = int(np.argmax(min_d2))
    np.testing.assert_array_equal(got, ref)
