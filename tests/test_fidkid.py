"""FID/KID math tests (reference npcd/utils/fidkid.py semantics)."""
import numpy as np
import pytest

from npcd_tpu.utils.fidkid import FIDKID, calc_fid, calc_kid


def test_fid_identical_is_zero():
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(500, 16))
    mean, cov = feats.mean(0), np.cov(feats, rowvar=False)
    fid, m, c = calc_fid(mean, cov, mean, cov)
    assert fid == pytest.approx(0.0, abs=1e-6)


def test_fid_mean_shift():
    """Identity covariances: FID = |mu1 - mu2|^2."""
    d = 8
    mean1 = np.zeros(d)
    mean2 = np.full(d, 0.5)
    cov = np.eye(d)
    fid, m, c = calc_fid(mean1, cov, mean2, cov)
    assert fid == pytest.approx(d * 0.25, rel=1e-6)
    assert c == pytest.approx(0.0, abs=1e-6)


def test_kid_same_distribution_near_zero():
    rng = np.random.default_rng(1)
    real = rng.normal(size=(400, 16))
    fake = rng.normal(size=(400, 16))
    kid = calc_kid(real, fake, num_subsets=20, max_subset_size=200,
                   rng=np.random.default_rng(0))
    assert abs(kid) < 0.5


def test_kid_detects_shift():
    rng = np.random.default_rng(2)
    real = rng.normal(size=(400, 16))
    fake = rng.normal(size=(400, 16)) + 2.0
    kid = calc_kid(real, fake, num_subsets=20, max_subset_size=200,
                   rng=np.random.default_rng(0))
    assert kid > 10.0


def test_fidkid_streaming_pipeline():
    rng = np.random.default_rng(3)
    proj = rng.normal(size=(48, 8)).astype(np.float32)
    extract = lambda imgs: imgs.reshape(len(imgs), -1) @ proj
    fk = FIDKID(num_images=32, feature_extractor=extract)
    imgs = rng.uniform(0, 1, (32, 4, 4, 3)).astype(np.float32)
    fk.feed(imgs[:16], "reals")
    fk.feed(imgs[16:], "reals")
    fk.feed(imgs[:16], "fakes")
    fk.feed(imgs[16:], "fakes")
    res = fk.summary(seed=0)
    assert res["fid"] == pytest.approx(0.0, abs=1e-4)
    # KID on identical *sets* has a negative O(1/m) bias from the diagonal
    # terms of the cross kernel; just require finiteness here (distribution
    # sensitivity is covered by test_kid_detects_shift).
    assert np.isfinite(res["kid"])


def test_fidkid_requires_real_stats():
    fk = FIDKID(num_images=4, feature_extractor=lambda x: x.reshape(len(x), -1))
    fk.feed(np.zeros((4, 2, 2, 3), np.float32), "fakes")
    with pytest.raises(ValueError, match="real statistics"):
        fk.summary()


def test_compute_inception_stats_tool(tmp_path):
    """tools/compute_inception_stats.py: SRN-style test tree -> reference
    pickle format {mean, cov, feats_np}; a FIDKID eval against the produced
    pickle with the same images as fakes gives FID ~ 0."""
    import pickle
    import sys
    import os.path as osp

    sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "tools"))
    from compute_inception_stats import compute_stats, iter_image_batches

    from PIL import Image

    rng = np.random.default_rng(0)
    images = []
    for obj in range(3):
        d = tmp_path / f"obj{obj}" / "rgb"
        d.mkdir(parents=True)
        for v in range(4):
            arr = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{v:06d}.png")
            images.append(arr.astype(np.float32) / 255.0)
    # non-rgb clutter must be ignored
    (tmp_path / "notes").mkdir()

    proj = rng.normal(size=(8 * 8 * 3, 6)).astype(np.float32)
    extract = lambda imgs: imgs.reshape(len(imgs), -1) @ proj

    batches = list(iter_image_batches(str(tmp_path), image_size=8, batch_size=5))
    assert sum(len(b) for b in batches) == 12
    stats = compute_stats(batches, extract)
    assert stats["feats_np"].shape == (12, 6)
    np.testing.assert_allclose(stats["mean"], stats["feats_np"].mean(0), rtol=1e-6)

    pkl = tmp_path / "stats.pkl"
    with open(pkl, "wb") as f:
        pickle.dump(stats, f)
    fk = FIDKID(num_images=12, feature_extractor=extract, inception_pkl=str(pkl))
    fk.prepare()
    fk.feed(np.stack(images), "fakes")
    assert fk.summary(seed=0)["fid"] == pytest.approx(0.0, abs=1e-3)
