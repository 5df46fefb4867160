"""Fused-MLP Pallas kernel vs the XLA apply_mlp path (values + grads)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from npcd_tpu.models.pointnerf.nn_core import apply_mlp, init_mlp
from npcd_tpu.ops.pallas.fused_mlp import fused_mlp


def _setup(d_in=95, dims=(256, 256, 256, 256), d_out=256, m=70):
    layers = init_mlp(jax.random.PRNGKey(0), dims, d_in, d_out)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, m, d_in))
    return layers, x


def test_fused_mlp_interpret_matches_xla():
    layers, x = _setup()
    ref = apply_mlp(layers, x, impl="xla")
    weights = tuple((l["w"], l["b"]) for l in layers)
    try:
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(fused_mlp(x, weights, True))
    except Exception as e:  # pragma: no cover
        pytest.skip(f"pallas interpret mode unavailable: {e}")
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_fused_mlp_grads_match_xla():
    layers, x = _setup(d_in=64, dims=(128, 128), d_out=128, m=40)
    ct = jax.random.normal(jax.random.PRNGKey(2), (2, 40, 128))
    weights = tuple((l["w"], l["b"]) for l in layers)

    def loss_ref(x, weights):
        ls = [{"w": w, "b": b} for w, b in weights]
        return (apply_mlp(ls, x, impl="xla") * ct).sum()

    def loss_pl(x, weights):
        return (fused_mlp(x, weights, True) * ct).sum()

    ref_dx, ref_dw = jax.grad(loss_ref, argnums=(0, 1))(x, weights)
    try:
        with pltpu.force_tpu_interpret_mode():
            pl_dx, pl_dw = jax.grad(loss_pl, argnums=(0, 1))(x, weights)
            pl_dx = np.asarray(pl_dx)
            pl_dw = jax.tree_util.tree_map(np.asarray, pl_dw)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"pallas interpret mode unavailable: {e}")
    np.testing.assert_allclose(pl_dx, np.asarray(ref_dx), rtol=1e-4, atol=1e-5)
    for (rw, rb), (pw, pb), i in zip(ref_dw, pl_dw, range(len(ref_dw))):
        np.testing.assert_allclose(pw, np.asarray(rw), rtol=1e-4, atol=1e-5,
                                   err_msg=f"dW{i}")
        np.testing.assert_allclose(pb, np.asarray(rb), rtol=1e-4, atol=1e-5,
                                   err_msg=f"db{i}")


def test_fused_mlp_small_out_dim():
    """shape_net-like head: d_out=1."""
    layers, x = _setup(d_in=256, dims=(256,), d_out=1, m=24)
    ref = apply_mlp(layers, x, impl="xla")
    weights = tuple((l["w"], l["b"]) for l in layers)
    try:
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(fused_mlp(x, weights, True))
    except Exception as e:  # pragma: no cover
        pytest.skip(f"pallas interpret mode unavailable: {e}")
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_fused_mlp_ragged_block_grads():
    """Regression: the ragged last row-block (rows % block size != 0) must
    not poison dW with out-of-bounds input rows (0 * garbage). Forces a
    tiny block size so m=37 spans 3 blocks with a ragged tail."""
    from npcd_tpu.ops.pallas import fused_mlp as fm

    layers, _ = _setup(d_in=64, dims=(128,), d_out=128, m=37)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 37, 64))
    ct = jax.random.normal(jax.random.PRNGKey(2), (1, 37, 128))
    weights = tuple((l["w"], l["b"]) for l in layers)

    def loss_ref(x, weights):
        ls = [{"w": w, "b": b} for w, b in weights]
        return (apply_mlp(ls, x, impl="xla") * ct).sum()

    def loss_pl(x, weights):
        return (fm.fused_mlp(x, weights, True) * ct).sum()

    ref_dx, ref_dw = jax.grad(loss_ref, argnums=(0, 1))(x, weights)
    orig_blk = fm._BLK
    fm._BLK = 16
    try:
        with pltpu.force_tpu_interpret_mode():
            pl_dx, pl_dw = jax.grad(loss_pl, argnums=(0, 1))(x, weights)
            pl_dx = np.asarray(pl_dx)
            pl_dw = jax.tree_util.tree_map(np.asarray, pl_dw)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"pallas interpret mode unavailable: {e}")
    finally:
        fm._BLK = orig_blk
    assert np.isfinite(pl_dx).all()
    np.testing.assert_allclose(pl_dx, np.asarray(ref_dx), rtol=1e-4, atol=1e-5)
    for (rw, rb), (pw, pb) in zip(ref_dw, pl_dw):
        assert np.isfinite(pw).all() and np.isfinite(pb).all()
        np.testing.assert_allclose(pw, np.asarray(rw), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(pb, np.asarray(rb), rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------- posenc


def _ref_posenc_mlp(feat_t, pos_t, weights, n_freqs, freq_mult, method):
    """Unfused composition the kernel replaces: transpose back, posenc,
    concat, apply_mlp."""
    from npcd_tpu.models.pointnerf.nn_core import positional_encoding

    feat = jnp.swapaxes(feat_t, 1, 2)  # [B, M, F]
    x = jnp.swapaxes(pos_t[:, :3], 1, 2)  # [B, M, 3]
    enc = positional_encoding(x, n_freqs, freq_mult, method=method)
    h = jnp.concatenate([feat, enc.astype(feat.dtype)], axis=-1)
    ls = [{"w": w, "b": b} for w, b in weights]
    return apply_mlp(ls, h, impl="xla")


def _posenc_setup(f_dim=32, n_freqs=10, m=70, dims=(256, 256, 256, 256),
                  d_out=256, dtype=jnp.float32):
    d_in = f_dim + 3 * (1 + 2 * n_freqs)
    layers = init_mlp(jax.random.PRNGKey(0), dims, d_in, d_out)
    weights = tuple((l["w"].astype(dtype), l["b"].astype(dtype))
                    for l in layers)
    feat_t = jax.random.normal(jax.random.PRNGKey(1), (2, f_dim, m)).astype(dtype)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 3, m)) * 0.05
    pos_t = jnp.pad(x, ((0, 0), (0, 5), (0, 0)))
    return feat_t, pos_t, weights


@pytest.mark.parametrize("method", ["direct", "recurrence"])
def test_fused_mlp_posenc_interpret_matches_xla(method):
    from npcd_tpu.ops.pallas.fused_mlp import fused_mlp_posenc

    feat_t, pos_t, weights = _posenc_setup()
    ref = _ref_posenc_mlp(feat_t, pos_t, weights, 10, 1.0, method)
    try:
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(fused_mlp_posenc(feat_t, pos_t, weights, 10,
                                              1.0, True, method))
    except Exception as e:  # pragma: no cover
        pytest.skip(f"pallas interpret mode unavailable: {e}")
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_fused_mlp_posenc_grads_match_xla():
    from npcd_tpu.ops.pallas.fused_mlp import fused_mlp_posenc

    feat_t, pos_t, weights = _posenc_setup(f_dim=16, n_freqs=4, m=40,
                                           dims=(64, 64), d_out=64)
    ct = jax.random.normal(jax.random.PRNGKey(3), (2, 40, 64))

    def loss_ref(feat_t, pos_t, weights):
        return (_ref_posenc_mlp(feat_t, pos_t, weights, 4, 1.0,
                                "direct") * ct).sum()

    def loss_pl(feat_t, pos_t, weights):
        return (fused_mlp_posenc(feat_t, pos_t, weights, 4, 1.0, True,
                                 "direct") * ct).sum()

    ref = jax.grad(loss_ref, argnums=(0, 1, 2))(feat_t, pos_t, weights)
    try:
        with pltpu.force_tpu_interpret_mode():
            got = jax.grad(loss_pl, argnums=(0, 1, 2))(feat_t, pos_t, weights)
            got = jax.tree_util.tree_map(np.asarray, got)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"pallas interpret mode unavailable: {e}")
    np.testing.assert_allclose(got[0], np.asarray(ref[0]), rtol=1e-4,
                               atol=1e-5, err_msg="dfeat")
    # dpos rows 3..7 are structural zero padding
    np.testing.assert_allclose(got[1][:, :3], np.asarray(ref[1][:, :3]),
                               rtol=1e-4, atol=1e-4, err_msg="dpos")
    assert np.all(got[1][:, 3:] == 0)
    for (rw, rb), (pw, pb), i in zip(ref[2], got[2], range(len(ref[2]))):
        np.testing.assert_allclose(pw, np.asarray(rw), rtol=1e-4, atol=1e-4,
                                   err_msg=f"dW{i}")
        np.testing.assert_allclose(pb, np.asarray(rb), rtol=1e-4, atol=1e-4,
                                   err_msg=f"db{i}")


def test_fused_mlp_posenc_bf16x3_emulated_high_precision():
    """Ambient 'tensorfloat32'/'high' matmul precision: Mosaic cannot lower
    HIGH dots, so _kdot emulates the bf16x3 algorithm with three DEFAULT
    passes. Must (a) run at all under the ambient setting, (b) agree with
    the exact reference far more tightly than a DEFAULT (single bf16 pass)
    dot could, fwd and bwd."""
    from npcd_tpu.ops.pallas.fused_mlp import fused_mlp_posenc

    feat_t, pos_t, weights = _posenc_setup(f_dim=16, n_freqs=4, m=40,
                                           dims=(64, 64), d_out=64)
    ct = jax.random.normal(jax.random.PRNGKey(3), (2, 40, 64))
    ref = _ref_posenc_mlp(feat_t, pos_t, weights, 4, 1.0, "direct")

    def loss(feat_t, pos_t, weights):
        return (fused_mlp_posenc(feat_t, pos_t, weights, 4, 1.0, True,
                                 "direct") * ct).sum()

    try:
        with jax.default_matmul_precision("tensorfloat32"):
            with pltpu.force_tpu_interpret_mode():
                got = np.asarray(fused_mlp_posenc(
                    feat_t, pos_t, weights, 4, 1.0, True, "direct"))
                gf, gw = jax.grad(loss, argnums=(0, 2))(feat_t, pos_t,
                                                        weights)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"pallas interpret mode unavailable: {e}")
    # bf16x3 operand error ~2^-16: well inside 1e-4 relative on these
    # O(1) activations (a single-pass DEFAULT dot sits at ~2^-8 and fails
    # this tolerance by two orders)
    np.testing.assert_allclose(got, np.asarray(ref), rtol=2e-4, atol=2e-4)
    ref_gf, ref_gw = jax.grad(
        lambda f, p, w: (_ref_posenc_mlp(f, p, w, 4, 1.0, "direct")
                         * ct).sum(), argnums=(0, 2))(feat_t, pos_t, weights)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(ref_gf),
                               rtol=2e-3, atol=2e-3)
    for (rw, rb), (pw, pb) in zip(ref_gw, gw):
        np.testing.assert_allclose(np.asarray(pw), np.asarray(rw),
                                   rtol=2e-3, atol=2e-3)


def test_fused_mlp_posenc_ragged_block():
    """M not a multiple of the block: OOB lanes must not poison outputs
    or dW (sin/cos of undefined loads are masked in-kernel)."""
    from npcd_tpu.ops.pallas.fused_mlp import fused_mlp_posenc

    feat_t, pos_t, weights = _posenc_setup(f_dim=8, n_freqs=3, m=37,
                                           dims=(32,), d_out=32)

    def loss(feat_t, pos_t, weights):
        return fused_mlp_posenc(feat_t, pos_t, weights, 3, 1.0, True,
                                "direct").sum()

    def loss_ref(feat_t, pos_t, weights):
        return _ref_posenc_mlp(feat_t, pos_t, weights, 3, 1.0, "direct").sum()

    ref = jax.grad(loss_ref, argnums=(0, 1))(feat_t, pos_t, weights)
    try:
        with pltpu.force_tpu_interpret_mode():
            val = loss(feat_t, pos_t, weights)
            got = jax.grad(loss, argnums=(0, 1))(feat_t, pos_t, weights)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"pallas interpret mode unavailable: {e}")
    assert np.isfinite(float(val))
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got[1][:, :3]),
                               np.asarray(ref[1][:, :3]), rtol=1e-4, atol=1e-4)


def _wsum_setup(f_dim=16, n_freqs=4, n=20, k=4, dims=(64, 64), d_out=64,
                dtype=jnp.float32, key=0):
    m = n * k
    feat_t, pos_t, weights = _posenc_setup(f_dim=f_dim, n_freqs=n_freqs,
                                           m=m, dims=dims, d_out=d_out,
                                           dtype=dtype)
    w = jax.nn.softmax(
        jax.random.normal(jax.random.PRNGKey(10 + key), (2, n, k)), axis=-1)
    # row 3 of pos_t carries the per-pair weight
    pos_t = pos_t.at[:, 3, :].set(w.reshape(2, m))
    return feat_t, pos_t, weights, w


def _ref_wsum(feat_t, pos_t, weights, k, n_freqs, freq_mult, method):
    out = _ref_posenc_mlp(feat_t, pos_t, weights, n_freqs, freq_mult, method)
    b, m, d = out.shape
    w = pos_t[:, 3, :].reshape(b, m // k, k)
    return jnp.einsum("bnk,bnkc->bnc",
                      w.astype(out.dtype), out.reshape(b, m // k, k, d))


def test_fused_mlp_posenc_wsum_matches_xla():
    from npcd_tpu.ops.pallas.fused_mlp import (fused_mlp_posenc_wsum,
                                               wsum_supported)

    feat_t, pos_t, weights, _ = _wsum_setup()
    assert wsum_supported(80, 4)
    ref = _ref_wsum(feat_t, pos_t, weights, 4, 4, 1.0, "direct")
    try:
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(fused_mlp_posenc_wsum(
                feat_t, pos_t, weights, 4, 4, 1.0, True, "direct"))
    except Exception as e:  # pragma: no cover
        pytest.skip(f"pallas interpret mode unavailable: {e}")
    assert got.shape == (2, 20, 64)
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_fused_mlp_posenc_wsum_grads_match_xla():
    """Grads wrt feat, pos (x_rel rows AND the w row), and all weights."""
    from npcd_tpu.ops.pallas.fused_mlp import fused_mlp_posenc_wsum

    feat_t, pos_t, weights, _ = _wsum_setup()
    ct = jax.random.normal(jax.random.PRNGKey(3), (2, 20, 64))

    def loss_ref(feat_t, pos_t, weights):
        return (_ref_wsum(feat_t, pos_t, weights, 4, 4, 1.0,
                          "direct") * ct).sum()

    def loss_pl(feat_t, pos_t, weights):
        return (fused_mlp_posenc_wsum(feat_t, pos_t, weights, 4, 4, 1.0,
                                      True, "direct",
                                      need_dw=True) * ct).sum()

    ref = jax.grad(loss_ref, argnums=(0, 1, 2))(feat_t, pos_t, weights)
    try:
        with pltpu.force_tpu_interpret_mode():
            got = jax.grad(loss_pl, argnums=(0, 1, 2))(feat_t, pos_t, weights)
            got = jax.tree_util.tree_map(np.asarray, got)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"pallas interpret mode unavailable: {e}")
    np.testing.assert_allclose(got[0], np.asarray(ref[0]), rtol=1e-4,
                               atol=1e-5, err_msg="dfeat")
    np.testing.assert_allclose(got[1][:, :4], np.asarray(ref[1][:, :4]),
                               rtol=1e-4, atol=1e-4, err_msg="dpos (x + w)")
    assert np.all(got[1][:, 4:] == 0)
    for (rw, rb), (pw, pb), i in zip(ref[2], got[2], range(len(ref[2]))):
        np.testing.assert_allclose(pw, np.asarray(rw), rtol=1e-4, atol=1e-4,
                                   err_msg=f"dW{i}")
        np.testing.assert_allclose(pb, np.asarray(rb), rtol=1e-4, atol=1e-4,
                                   err_msg=f"db{i}")


def test_fused_mlp_posenc_wsum_ragged_block():
    """M spanning multiple blocks with a ragged tail: OOB lanes feed the
    in-kernel reduction dot, so garbage there would NaN-poison valid
    points — must stay finite and match."""
    from npcd_tpu.ops.pallas import fused_mlp as fm

    feat_t, pos_t, weights, _ = _wsum_setup(f_dim=8, n_freqs=3, n=22, k=2,
                                            dims=(32,), d_out=32)

    def loss(feat_t, pos_t, weights):
        return fm.fused_mlp_posenc_wsum(feat_t, pos_t, weights, 2, 3, 1.0,
                                        True, "direct", need_dw=True).sum()

    def loss_ref(feat_t, pos_t, weights):
        return _ref_wsum(feat_t, pos_t, weights, 2, 3, 1.0, "direct").sum()

    ref_v = loss_ref(feat_t, pos_t, weights)
    ref = jax.grad(loss_ref, argnums=(0, 1))(feat_t, pos_t, weights)
    orig_blk = fm._BLK
    fm._BLK = 16  # unit = 8*k = 16 -> blk 16, grid j = ceil(44/16) = 3 ragged
    try:
        with pltpu.force_tpu_interpret_mode():
            val = loss(feat_t, pos_t, weights)
            got = jax.grad(loss, argnums=(0, 1))(feat_t, pos_t, weights)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"pallas interpret mode unavailable: {e}")
    finally:
        fm._BLK = orig_blk
    assert np.isfinite(float(val))
    np.testing.assert_allclose(float(val), float(ref_v), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got[1][:, :4]),
                               np.asarray(ref[1][:, :4]), rtol=1e-4, atol=1e-4)


def test_aggregate_features_posenc_fused_matches_xla():
    """Full aggregation path: fused posenc kernel + transposed gathers vs
    the XLA path — values, validity, weights, and grads wrt kp_feat and
    the MLP params."""
    from npcd_tpu.models.pointnerf.aggregator import aggregate_features
    from npcd_tpu.models.pointnerf.nn_core import init_mlp, posenc_dim
    from npcd_tpu.utils.config import AggregatorOptions

    opts = AggregatorOptions(k=4, n_freqs=5, layers=(64, 64), out_dim=64)
    f_dim, b, n, p = 16, 2, 40, 24
    d_in = f_dim + posenc_dim(3, opts.n_freqs)
    params = {"local_field": init_mlp(jax.random.PRNGKey(0), opts.layers,
                                      d_in, opts.out_dim)}
    shading_pts = jax.random.normal(jax.random.PRNGKey(1), (b, n, 3)) * 0.3
    pts_mask = jax.random.bernoulli(jax.random.PRNGKey(2), 0.8, (b, n))
    kp_pos = jax.random.normal(jax.random.PRNGKey(3), (b, p, 3)) * 0.3
    kp_feat = jax.random.normal(jax.random.PRNGKey(4), (b, p, f_dim))

    def run(impl, kp_feat):
        return aggregate_features(
            params, opts, 0.5, shading_pts, pts_mask, kp_pos, kp_feat,
            compute_dtype=jnp.float32, return_weights=True, impl=impl)

    ref_feat, ref_valid, ref_w, ref_idx = run("xla", kp_feat)
    try:
        with pltpu.force_tpu_interpret_mode():
            got_feat, got_valid, got_w, got_idx = run("posenc_fused", kp_feat)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"pallas interpret mode unavailable: {e}")
    np.testing.assert_array_equal(np.asarray(got_valid), np.asarray(ref_valid))
    np.testing.assert_array_equal(np.asarray(got_idx), np.asarray(ref_idx))
    np.testing.assert_allclose(np.asarray(got_w), np.asarray(ref_w),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_feat), np.asarray(ref_feat),
                               rtol=1e-4, atol=1e-5)

    def loss(impl, kp_feat, params_):
        feat, _ = aggregate_features(
            params_, opts, 0.5, shading_pts, pts_mask, kp_pos, kp_feat,
            compute_dtype=jnp.float32, impl=impl)
        return (feat * jnp.arange(feat.size).reshape(feat.shape)).sum()

    ref_g = jax.grad(lambda kf, pr: loss("xla", kf, pr),
                     argnums=(0, 1))(kp_feat, params)
    with pltpu.force_tpu_interpret_mode():
        got_g = jax.grad(lambda kf, pr: loss("posenc_fused", kf, pr),
                         argnums=(0, 1))(kp_feat, params)
    np.testing.assert_allclose(np.asarray(got_g[0]), np.asarray(ref_g[0]),
                               rtol=1e-3, atol=1e-2, err_msg="d kp_feat")
    for rl, gl, i in zip(ref_g[1]["local_field"], got_g[1]["local_field"],
                         range(99)):
        np.testing.assert_allclose(np.asarray(gl["w"]), np.asarray(rl["w"]),
                                   rtol=1e-3, atol=1e-2, err_msg=f"dW{i}")
        np.testing.assert_allclose(np.asarray(gl["b"]), np.asarray(rl["b"]),
                                   rtol=1e-3, atol=1e-2, err_msg=f"db{i}")


def test_agg_weight_cotangent_dead():
    """The inverse-distance aggregation weights are non-differentiable in
    EVERY aggregate_features impl (the gradient contract pinned in its
    docstring): differentiating through shading_pts — the only input that
    could reach w if it ever became trainable — must see zero flow through
    the weights in the XLA path, so the wsum kernel's need_dw=False and the
    fused path's stop_gradient can never diverge from it."""
    from npcd_tpu.models.pointnerf.aggregator import aggregate_features
    from npcd_tpu.models.pointnerf.nn_core import init_mlp
    from npcd_tpu.utils.config import pointnerf_default_options

    opts = pointnerf_default_options(num_points=16, feat_dim=8).aggregator
    rng = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    kp_pos = jax.random.uniform(k1, (2, 16, 3), minval=-0.4, maxval=0.4)
    kp_feat = jax.random.normal(k2, (2, 16, 8)) * 0.1
    shading_pts = jax.random.uniform(k3, (2, 12, 3), minval=-0.4, maxval=0.4)
    pts_mask = jnp.ones((2, 12), bool)
    from npcd_tpu.models.pointnerf.nn_core import posenc_dim
    agg_in = 8 + posenc_dim(3, opts.n_freqs)
    params = {"local_field": init_mlp(k4, opts.layers, agg_in, opts.out_dim)}

    def loss(pts):
        # diff_pts=True restores the reference's full autodiff through
        # shading points (posenc/MLP-input path live); the default
        # (diff_pts=False, asserted below) also detaches x_rel — the
        # production fast path, where pts have no trainable ancestors.
        feat, _ = aggregate_features(
            params, opts, 0.5, pts, pts_mask, kp_pos, kp_feat, impl="xla",
            diff_pts=True)
        return (feat ** 2).sum()

    # gradients through shading_pts still flow via the posenc(x_rel) MLP
    # input (differentiable in the reference too) — but the w (inverse
    # distance) path must be dead: the jvp of aggregate_features must
    # equal a manual recompute where ONLY the w path is detached.
    tangent = jax.random.normal(jax.random.PRNGKey(9), shading_pts.shape)
    _, jvp_val = jax.jvp(loss, (shading_pts,), (tangent,))
    # reference jvp with the posenc/MLP path live and w dead, computed
    # manually: identical because aggregate_features detaches w
    def loss_manual(pts):
        from npcd_tpu.models.pointnerf.aggregator import (
            gather_rows, knn_neighbors)
        from npcd_tpu.models.pointnerf.nn_core import (
            apply_mlp, positional_encoding)
        idx, nb_mask = knn_neighbors(
            jax.lax.stop_gradient(pts), pts_mask, kp_pos, opts.k, 0.5)
        nb_pos = gather_rows(kp_pos, idx)
        x_rel = pts[:, :, None, :] - nb_pos
        dist = jnp.linalg.norm(
            jax.lax.stop_gradient(x_rel), axis=-1)  # w path: DEAD
        w = (1.0 / (dist + 1e-5)) * nb_mask.astype(dist.dtype)
        w_sum = jnp.sum(w, axis=-1, keepdims=True)
        w = jnp.where(w_sum > 0, w / w_sum, 0.0)
        x_enc = positional_encoding(
            x_rel, opts.n_freqs, opts.freq_mult, method=opts.posenc_method)
        field_in = jnp.concatenate([gather_rows(kp_feat, idx), x_enc], -1)
        b, n, kk = field_in.shape[:3]
        lf = apply_mlp(params["local_field"], field_in.reshape(b, n * kk, -1),
                       act=opts.activation).reshape(b, n, kk, -1)
        feat = jnp.einsum("bnk,bnkc->bnc", w, lf)
        return (feat ** 2).sum()

    _, jvp_ref = jax.jvp(loss_manual, (shading_pts,), (tangent,))
    np.testing.assert_allclose(float(jvp_val), float(jvp_ref),
                               rtol=1e-5, atol=1e-7)

    # default contract (diff_pts=False): x_rel is ALSO dead — the pts
    # cotangent through aggregate_features is structurally zero, matching
    # the wsum kernel's need_dp=False so the runtime-selected paths can
    # never diverge
    def loss_default(pts):
        feat, _ = aggregate_features(
            params, opts, 0.5, pts, pts_mask, kp_pos, kp_feat, impl="xla")
        return (feat ** 2).sum()

    _, jvp_dead = jax.jvp(loss_default, (shading_pts,), (tangent,))
    np.testing.assert_allclose(float(jvp_dead), 0.0, atol=1e-7)


def test_fused_mlp_posenc_wsum_need_dp_false():
    """The production flags (need_dw=False, need_dp=False): dfeat and all
    weight grads match autodiff of the reference formulation exactly as in
    the need_dw=True test, the dpos cotangent is structurally zero, and
    the forward is unchanged. Pins the dead-cotangent elision
    (fast-dW-last + sliced dh0t dot) against the full-bwd kernel."""
    from npcd_tpu.ops.pallas.fused_mlp import fused_mlp_posenc_wsum

    feat_t, pos_t, weights, _ = _wsum_setup()
    ct = jax.random.normal(jax.random.PRNGKey(3), (2, 20, 64))

    def loss_ref(feat_t, pos_t, weights):
        return (_ref_wsum(jax.lax.stop_gradient(feat_t) + feat_t * 0,
                          jax.lax.stop_gradient(pos_t), weights, 4, 4, 1.0,
                          "direct") * ct).sum()

    def loss_pl(feat_t, pos_t, weights):
        return (fused_mlp_posenc_wsum(feat_t, pos_t, weights, 4, 4, 1.0,
                                      True, "direct", need_dw=False,
                                      need_dp=False) * ct).sum()

    ref_v = loss_ref(feat_t, pos_t, weights)
    ref = jax.grad(lambda f, p, w: (_ref_wsum(f, jax.lax.stop_gradient(p),
                                              w, 4, 4, 1.0, "direct")
                                    * ct).sum(),
                   argnums=(0, 2))(feat_t, pos_t, weights)
    try:
        with pltpu.force_tpu_interpret_mode():
            val = loss_pl(feat_t, pos_t, weights)
            got = jax.grad(loss_pl, argnums=(0, 1, 2))(feat_t, pos_t, weights)
            got = jax.tree_util.tree_map(np.asarray, got)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"pallas interpret mode unavailable: {e}")
    np.testing.assert_allclose(float(val), float(ref_v), rtol=1e-4)
    np.testing.assert_allclose(got[0], np.asarray(ref[0]), rtol=1e-4,
                               atol=1e-5, err_msg="dfeat")
    assert np.all(got[1] == 0), "dpos must be structurally zero"
    for (rw, rb), (pw, pb), i in zip(ref[1], got[2], range(len(ref[1]))):
        np.testing.assert_allclose(pw, np.asarray(rw), rtol=1e-4, atol=1e-4,
                                   err_msg=f"dW{i}")
        np.testing.assert_allclose(pb, np.asarray(rb), rtol=1e-4, atol=1e-4,
                                   err_msg=f"db{i}")
