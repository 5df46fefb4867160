"""Oracle test: the JAX InceptionV3 must reproduce tf-keras layer-for-layer.

tf_keras's InceptionV3 implementation (the canonical TF-slim 2016
architecture, the same one pytorch-fid ports) is available in this image,
so the architecture is validated end-to-end on random weights — any
conv/pool/BN/topology deviation shows up as a feature mismatch.
"""
import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from npcd_tpu.utils.inception_jax import (  # noqa: E402
    JaxInceptionExtractor,
    inception_v3_features,
    params_from_keras_model,
)


@pytest.fixture(scope="module")
def keras_model():
    tf.config.set_visible_devices([], "GPU")
    from tf_keras.applications import InceptionV3

    return InceptionV3(weights=None, include_top=False, pooling="avg")


@pytest.mark.slow
def test_matches_tf_keras(keras_model):
    rng = np.random.RandomState(0)
    x = rng.rand(2, 299, 299, 3).astype(np.float32) * 2.0 - 1.0

    ref = keras_model.predict(x, verbose=0)  # [2, 2048]

    import jax.numpy as jnp

    params = params_from_keras_model(keras_model)
    got = np.asarray(inception_v3_features(
        [tuple(jnp.asarray(w) for w in p) for p in params], jnp.asarray(x)
    ))
    assert got.shape == ref.shape == (2, 2048)
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-3)


@pytest.mark.slow
def test_extractor_batching(keras_model):
    params = params_from_keras_model(keras_model)
    ex = JaxInceptionExtractor(params, batch_size=4)
    rng = np.random.RandomState(1)
    imgs = rng.rand(6, 64, 64, 3).astype(np.float32)  # resized internally
    feats = ex(imgs)
    assert feats.shape == (6, 2048)
    # batching must not change values (pad chunk is trimmed)
    feats2 = JaxInceptionExtractor(params, batch_size=8)(imgs)
    np.testing.assert_allclose(feats, feats2, atol=1e-4)


@pytest.mark.slow
def test_load_keras_h5_roundtrip(keras_model, tmp_path):
    """save_weights h5 -> load_keras_h5 must reproduce the live model's
    params (covers the h5 group layout and 0-based layer naming; the
    1-based Keras-2.0 release-file convention shares the same code path
    via the offset probe)."""
    import h5py

    from npcd_tpu.utils.inception_jax import load_keras_h5

    path = str(tmp_path / "w.h5")
    keras_model.save_weights(path)
    with h5py.File(path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        assert "conv2d" in root or "conv2d_1" in root
    loaded = load_keras_h5(path)
    ref = params_from_keras_model(keras_model)
    assert len(loaded) == len(ref) == 94
    for (lk, lb, lm, lv), (rk, rb, rm, rv) in zip(loaded, ref):
        np.testing.assert_array_equal(lk, rk)
        np.testing.assert_array_equal(lb, rb)
        np.testing.assert_array_equal(lm, rm)
        np.testing.assert_array_equal(lv, rv)
