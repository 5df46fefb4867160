"""JAX-native InceptionV3 feature extractor for FID/KID on TPU.

The reference computes FID through mmgen's TorchScript InceptionV3 on GPU
(reference npcd/utils/fidkid.py:57-108); this repo's TorchScriptInceptionExtractor
keeps that exact path (CPU torch) for number-for-number parity with the
published FID 28.6. This module adds a TPU-native extractor so the
generate->render->score loop (1000 objects x 251 poses) never leaves the
device: InceptionV3 (the tf-keras/TF-slim 2016 architecture, which is also
what pytorch-fid ports) as a pure JAX function over an explicit weight list.

Weights: load_keras_h5() reads the standard Keras release file
(inception_v3_weights_tf_dim_ordering_tf_kernels_notop.h5) directly with
h5py — no TensorFlow needed at runtime; params_from_keras_model() converts
a live tf-keras model (used by the oracle test, which validates this
implementation against tf_keras layer-by-layer output on random weights).

NOTE on comparability: FID values depend on the Inception weights and the
resize kernel; numbers from this extractor are self-consistent (and match
any other keras-weights pipeline using bilinear resize) but are not
interchangeable with the mmgen TorchScript graph's. Use the TorchScript
extractor when comparing against the paper's table.
"""
from __future__ import annotations

import functools
from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# (out_channels, kernel_h, kernel_w, stride, padding) per conv2d_bn call,
# in tf_keras call order (tf_keras/src/applications/inception_v3.py:160-355);
# 'M'/'A' entries are max/avg pools, 'C<n>' starts concat group collection.
_EPS = 1e-3


def conv_bn(x: jnp.ndarray, p, stride: int, padding: str) -> jnp.ndarray:
    """Conv(no bias) + BatchNorm(scale=False, eps 1e-3) + relu — the keras
    conv2d_bn block (inception_v3.py:404-443)."""
    kernel, beta, mean, var = p
    x = jax.lax.conv_general_dilated(
        x, kernel, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    x = (x - mean) * jax.lax.rsqrt(var + _EPS) + beta
    return jax.nn.relu(x)


def _max_pool(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )


def _avg_pool_same(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-1 SAME average pool with TF semantics: padded cells are
    excluded from the divisor (count_include_pad=False)."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "SAME"
    )
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    cnt = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "SAME"
    )
    return s / cnt


def inception_v3_features(params: Sequence, x: jnp.ndarray) -> jnp.ndarray:
    """x: [N, 299, 299, 3] in [-1, 1] -> pool features [N, 2048].

    `params`: list of (kernel [kh,kw,ci,co], bn_beta, bn_mean, bn_var)
    tuples, one per conv2d_bn call in keras call order (94 total)."""
    it = iter(params)
    nxt = lambda: next(it)
    cb = lambda x, stride=1, padding="SAME": conv_bn(x, nxt(), stride, padding)

    x = cb(x, 2, "VALID")           # 149x149x32
    x = cb(x, 1, "VALID")           # 147x147x32
    x = cb(x)                       # 147x147x64
    x = _max_pool(x)                # 73x73x64
    x = cb(x, 1, "VALID")           # 73x73x80
    x = cb(x, 1, "VALID")           # 71x71x192
    x = _max_pool(x)                # 35x35x192

    # mixed 0-2: 35x35
    for _ in range(3):
        b1 = cb(x)
        b5 = cb(cb(x))
        b3 = cb(cb(cb(x)))
        bp = cb(_avg_pool_same(x))
        x = jnp.concatenate([b1, b5, b3, bp], axis=-1)

    # mixed 3: 17x17x768
    b3 = cb(x, 2, "VALID")
    b3d = cb(cb(x))
    b3d = cb(b3d, 2, "VALID")
    x = jnp.concatenate([b3, b3d, _max_pool(x)], axis=-1)

    # mixed 4-7: 17x17x768 (7x1/1x7 factorized branches)
    for _ in range(4):
        b1 = cb(x)
        b7 = cb(cb(cb(x)))
        b7d = cb(cb(cb(cb(cb(x)))))
        bp = cb(_avg_pool_same(x))
        x = jnp.concatenate([b1, b7, b7d, bp], axis=-1)

    # mixed 8: 8x8x1280
    b3 = cb(cb(x), 2, "VALID")
    b7 = cb(cb(cb(x)))
    b7 = cb(b7, 2, "VALID")
    x = jnp.concatenate([b3, b7, _max_pool(x)], axis=-1)

    # mixed 9-10: 8x8x2048 (split 1x3/3x1 branches)
    for _ in range(2):
        b1 = cb(x)
        b3 = cb(x)
        b3 = jnp.concatenate([cb(b3), cb(b3)], axis=-1)
        b3d = cb(cb(x))
        b3d = jnp.concatenate([cb(b3d), cb(b3d)], axis=-1)
        bp = cb(_avg_pool_same(x))
        x = jnp.concatenate([b1, b3, b3d, bp], axis=-1)

    rest = sum(1 for _ in it)
    if rest:
        raise ValueError(f"{rest} unused inception params — wrong weight list")
    return jnp.mean(x, axis=(1, 2))  # global average pool -> [N, 2048]


# -- weight loading -----------------------------------------------------------

N_CONV = 94  # conv2d_bn calls in InceptionV3


def params_from_keras_model(model) -> List[Tuple[np.ndarray, ...]]:
    """Extract (kernel, beta, mean, var) tuples from a live tf-keras
    InceptionV3 (include_top=False), ordered by layer *creation* index
    (the _N suffix in auto-generated names — model.layers itself is
    topologically sorted, which interleaves parallel branches differently
    from the source's call order). The Nth-created Conv2D pairs with the
    Nth-created BatchNormalization."""

    def idx(name: str, base: str) -> int:
        rest = name[len(base):]
        return 0 if rest == "" else int(rest.lstrip("_"))

    convs, bns = {}, {}
    for layer in model.layers:
        cls = type(layer).__name__
        if cls == "Conv2D":
            convs[idx(layer.name, "conv2d")] = layer.get_weights()[0]
        elif cls == "BatchNormalization":
            bns[idx(layer.name, "batch_normalization")] = layer.get_weights()
    if len(convs) != N_CONV or len(bns) != N_CONV:
        raise ValueError(f"expected {N_CONV} conv/bn layers, got {len(convs)}/{len(bns)}")
    return [
        (convs[i].astype(np.float32),)
        + tuple(w.astype(np.float32) for w in bns[i])
        for i in range(N_CONV)
    ]


def load_keras_h5(path: str) -> List[Tuple[np.ndarray, ...]]:
    """Load a Keras InceptionV3 weight file directly with h5py.

    Handles both layer-naming conventions: modern tf-keras saves creation
    indices 0-based ('conv2d', 'conv2d_1', ...) while the Keras-2.0-era
    release file (inception_v3_weights_tf_dim_ordering_tf_kernels_notop.h5)
    is 1-based ('conv2d_1'..'conv2d_94')."""
    import h5py

    params = []
    with h5py.File(path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        offset = 0 if "conv2d" in root else 1
        if offset and "conv2d_1" not in root:
            raise ValueError(
                f"{path!r} has neither 'conv2d' nor 'conv2d_1' layer groups; "
                f"found: {sorted(root.keys())[:8]}..."
            )

        def name(base, i):
            j = i + offset
            return base if j == 0 else f"{base}_{j}"

        def leaf(g, wname):
            # h5 layout is either <layer>/<weight_name>:0 or
            # <layer>/<layer>/<weight_name>:0
            if wname in g:
                return np.asarray(g[wname])
            return np.asarray(g[list(g.keys())[0]][wname])

        for i in range(N_CONV):
            cg = root[name("conv2d", i)]
            bg = root[name("batch_normalization", i)]
            kernel = leaf(cg, "kernel:0")
            beta = leaf(bg, "beta:0")
            mean = leaf(bg, "moving_mean:0")
            var = leaf(bg, "moving_variance:0")
            params.append((kernel.astype(np.float32), beta.astype(np.float32),
                           mean.astype(np.float32), var.astype(np.float32)))
    return params


class JaxInceptionExtractor:
    """TPU-resident Inception pool-feature extractor (fidkid.FIDKID plug-in).

    images: [N, H, W, 3] float in [0, 1] -> features [N, 2048] (numpy).
    Resizes to 299 bilinear and maps to [-1, 1] (the keras `tf` mode /
    pytorch-fid normalize_input convention).

    Accepts numpy OR device-resident jax arrays. A jax.Array input is
    chunked by on-device slicing, so renders produced on the TPU feed the
    extractor with no device->host->device round trip (over a tunneled
    device the per-batch host hop was the measured extraction ceiling,
    docs/experiments/fid_extract.json); only the [N, 2048] features come
    back to the host."""

    feature_dim = 2048
    device_resident = True  # diffusion_evaluation may feed device arrays

    def __init__(self, weights: Any, batch_size: int = 64):
        if isinstance(weights, (str,)):
            weights = load_keras_h5(weights)
        self.params = [tuple(jnp.asarray(w) for w in p) for p in weights]
        self.batch_size = batch_size

        @jax.jit
        def run(imgs):
            imgs = jax.image.resize(
                imgs, (imgs.shape[0], 299, 299, 3), method="bilinear"
            )
            return inception_v3_features(self.params, imgs * 2.0 - 1.0)

        self._run = run

    def __call__(self, images) -> np.ndarray:
        on_device = isinstance(images, jax.Array)
        if not on_device:
            images = np.asarray(images, np.float32)
        xp = jnp if on_device else np
        out = []
        bs = self.batch_size
        n = images.shape[0]
        for i in range(0, n, bs):
            chunk = images[i : i + bs]  # device slice when on_device
            pad = 0
            if chunk.shape[0] < bs and n > bs:
                pad = bs - chunk.shape[0]  # keep one compiled shape
                chunk = xp.concatenate(
                    [chunk, xp.repeat(chunk[:1], pad, axis=0)], axis=0)
            feats = np.asarray(self._run(
                chunk if on_device else jnp.asarray(chunk)))
            out.append(feats[: len(feats) - pad if pad else len(feats)])
        return np.concatenate(out, axis=0)
