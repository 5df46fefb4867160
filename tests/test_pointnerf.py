"""PointNeRF forward/gradient behavior tests."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from npcd_tpu.data.synthetic import random_cameras
from npcd_tpu.models.pointnerf import PointNeRF, PointNeRFRenderConfig
from npcd_tpu.utils.config import pointnerf_default_options


@pytest.fixture(scope="module")
def setup():
    opts = pointnerf_default_options(num_points=24, feat_dim=8)
    opts = dataclasses.replace(
        opts,
        renderer=dataclasses.replace(opts.renderer, depth_resolution=24, ray_subsamples=32),
        aggregator=dataclasses.replace(opts.aggregator, max_shading_pts=8),
        default_resolution=12,
    )
    pn = PointNeRF(
        n_obj=3, feats_dim=8, num_points=24, opts=opts,
        render_config=PointNeRFRenderConfig(train_rays=12, train_ray_chunk=8, eval_ray_chunk=48),
    )
    params = pn.init_params(jax.random.PRNGKey(0))
    coords = jax.random.uniform(jax.random.PRNGKey(1), (3, 24, 3), minval=-0.4, maxval=0.4)
    params = pn.set_all_coords(params, coords)
    extr, intr = random_cameras(2, 12, seed=3)
    extr = jnp.tile(jnp.asarray(extr)[None], (2, 1, 1, 1))
    intr = jnp.tile(jnp.asarray(intr)[None], (2, 1, 1, 1))
    return pn, params, extr, intr


def test_forward_shapes_train(setup):
    pn, params, extr, intr = setup
    pred, aux = pn.forward(params, jnp.array([0, 1]), intr, extr,
                           rng=jax.random.PRNGKey(2), train=True)
    assert pred["channels"].shape == (2, 2, 12, 3)
    assert pred["ray_idx"].shape == (2, 2, 12)
    assert aux["feats_mean"].shape == (2, 24, 8)
    # ray indices are valid pixel ids
    assert (np.asarray(pred["ray_idx"]) >= 0).all()
    assert (np.asarray(pred["ray_idx"]) < 144).all()


def test_forward_eval_full_resolution(setup):
    pn, params, extr, intr = setup
    pred, _ = pn.forward(params, jnp.array([0, 1]), intr, extr, train=False)
    assert pred["channels"].shape == (2, 2, 144, 3)
    ch = np.asarray(pred["channels"])
    # white background where rays miss everything
    invalid = ~np.asarray(pred["ray_valid"])
    assert invalid.any()
    np.testing.assert_allclose(ch[invalid], 1.0, atol=1e-5)
    assert (ch >= 0).all() and (ch <= 1 + 1e-5).all()


def test_render_explicit_cloud(setup):
    pn, params, extr, intr = setup
    coords = jax.random.uniform(jax.random.PRNGKey(5), (1, 24, 3), minval=-0.4, maxval=0.4)
    feats = jax.random.normal(jax.random.PRNGKey(6), (1, 24, 8)) * 0.1
    out = pn.render(params, coords, feats, extr[:1], intr[:1], resolution=12)
    assert out["channels"].shape == (1, 2, 144, 3)
    assert np.isfinite(np.asarray(out["channels"])).all()


def test_render_kp_weights_diagnostic(setup):
    """kp_weights=True composites per-keypoint aggregation weights along
    each ray (reference field.py:148-149 / renderer.py:177-184). Invariant:
    aggregation weights are normalized per shading point, so summing the
    composite over keypoints must reproduce the ray's total march weight
    ('mask'). The vis hook must accept the per-view map."""
    pn, params, extr, intr = setup
    coords = jax.random.uniform(jax.random.PRNGKey(5), (1, 24, 3), minval=-0.4, maxval=0.4)
    feats = jax.random.normal(jax.random.PRNGKey(6), (1, 24, 8)) * 0.1
    out = pn.render(params, coords, feats, extr[:1], intr[:1], resolution=12,
                    kp_weights=True)
    kp_w = np.asarray(out["kp_weights"])
    assert kp_w.shape == (1, 2, 144, 24)
    assert (kp_w >= 0).all()
    np.testing.assert_allclose(
        kp_w.sum(-1), np.asarray(out["mask"])[..., 0], rtol=1e-4, atol=1e-5
    )
    # the baseline outputs are unchanged by the diagnostic
    base = pn.render(params, coords, feats, extr[:1], intr[:1], resolution=12)
    np.testing.assert_allclose(np.asarray(out["channels"]),
                               np.asarray(base["channels"]), atol=1e-6)

    from npcd_tpu.utils.vis import vis_kp_attribution

    img = vis_kp_attribution(kp_w[0, 0])
    assert img.shape == (12, 12, 3)
    assert np.isfinite(img).all() and (img >= 0).all() and (img <= 1).all()


def test_gradients_respect_frozen_coords(setup):
    pn, params, extr, intr = setup

    def loss_fn(p):
        pred, aux = pn.forward(p, jnp.array([0, 1]), intr, extr,
                               rng=jax.random.PRNGKey(3), train=True)
        valid = pred["ray_valid"][..., None]
        return jnp.sum(pred["channels"] * valid) + jnp.sum(aux["feats_mean"] ** 2) * 0.0

    grads = jax.grad(loss_fn)(params)
    # feats table gets gradient (through reparametrized render)
    assert np.abs(np.asarray(grads["feats_table"])).max() > 0
    # aggregator MLP gets gradient
    assert np.abs(np.asarray(grads["aggregator"]["local_field"][0]["w"])).max() > 0
    # coords influence only via stop_gradient paths -> zero gradient
    assert np.abs(np.asarray(grads["coords_table"])).max() == 0


def test_train_eval_rays_consistent(setup):
    """Rendering the pixels selected in train mode should roughly agree with
    the same pixels from a full eval render using mean feats (train-mode
    variational sampling is the only stochastic difference; zero-init
    log_var gives std 1, so compare masks not colors)."""
    pn, params, extr, intr = setup
    pred_t, _ = pn.forward(params, jnp.array([0, 1]), intr, extr,
                           rng=jax.random.PRNGKey(4), train=True)
    pred_e, _ = pn.forward(params, jnp.array([0, 1]), intr, extr, train=False)
    idx = np.asarray(pred_t["ray_idx"])  # [B, V, R]
    valid_t = np.asarray(pred_t["ray_valid"])
    valid_e = np.take_along_axis(np.asarray(pred_e["ray_valid"]), idx, axis=2)
    # train-selected valid rays are overwhelmingly valid in the eval pass too
    # (train depth jitter can flip validity of grazing rays, so not exactly all)
    agreement = valid_e[valid_t].mean() if valid_t.any() else 1.0
    assert agreement > 0.85, agreement


def test_shading_budget_matches_dense(setup):
    """The budgeted shading-point compaction (render_config.shading_budget)
    must reproduce the dense path exactly when the budget covers every
    valid sample: same pixels, same feature-table gradients."""
    pn, params, extr, intr = setup
    # budget < R*M (12*8=96) but >= any plausible valid count
    pn_b = PointNeRF(
        n_obj=3, feats_dim=8, num_points=24, opts=pn.opts,
        render_config=dataclasses.replace(pn.cfg, shading_budget=88),
    )
    rng = jax.random.PRNGKey(7)
    obj = jnp.array([0, 1])

    def loss_fn(model, p):
        pred, _ = model.forward(p, obj, intr, extr, rng=rng, train=True)
        return jnp.sum(pred["channels"] ** 2) + jnp.sum(pred["mask"] ** 2), pred

    (l_d, pred_d), g_d = jax.value_and_grad(lambda p: loss_fn(pn, p), has_aux=True)(params)
    (l_b, pred_b), g_b = jax.value_and_grad(lambda p: loss_fn(pn_b, p), has_aux=True)(params)

    np.testing.assert_allclose(np.asarray(pred_b["channels"]),
                               np.asarray(pred_d["channels"]), atol=1e-5)
    np.testing.assert_allclose(float(l_b), float(l_d), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_b["feats_table"]),
                               np.asarray(g_d["feats_table"]), atol=1e-5)
    flat_b = jax.tree_util.tree_leaves(g_b["field"])
    flat_d = jax.tree_util.tree_leaves(g_d["field"])
    for wb, wd in zip(flat_b, flat_d):
        np.testing.assert_allclose(
            np.asarray(wb, np.float32), np.asarray(wd, np.float32), atol=1e-5)


def test_shading_budget_overflow_runs(setup):
    """A budget smaller than the valid count drops the overflow samples but
    must still produce finite outputs and gradients."""
    pn, params, extr, intr = setup
    pn_b = PointNeRF(
        n_obj=3, feats_dim=8, num_points=24, opts=pn.opts,
        render_config=dataclasses.replace(pn.cfg, shading_budget=16),
    )
    def loss_fn(p):
        pred, _ = pn_b.forward(p, jnp.array([0, 1]), intr, extr,
                               rng=jax.random.PRNGKey(7), train=True)
        return jnp.sum(pred["channels"] ** 2)
    l, g = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(l))
    assert np.isfinite(np.asarray(g["feats_table"])).all()


def test_budget_rank_counting_sort():
    """The budget path's counting-sort packed positions (three cumsums,
    pointnerf.py _render_core) must equal the stable-argsort formulation
    they replaced, and pack_rows(table, rank, cap) must equal
    gather_rows(table, argsort(key)[:cap]) including gradients."""
    from npcd_tpu.models.pointnerf.aggregator import gather_rows, pack_rows

    rng = np.random.default_rng(0)
    I, R, m, cap = 4, 13, 17, 23
    for trial in range(5):
        mask = rng.random((I, R, m)) < rng.uniform(0.05, 0.9)
        flat = mask.reshape(I, R * m)
        sample_j = np.tile(np.arange(m), R)[None, :]
        key = np.where(flat, sample_j, m)
        order = np.argsort(key, axis=1, kind="stable")
        rank_ref = np.argsort(order, axis=1, kind="stable")

        mask_i = mask.astype(np.int32)
        cnt_j = mask_i.sum(axis=1)
        offset_j = np.cumsum(cnt_j, axis=1) - cnt_j
        prefix_r = np.cumsum(mask_i, axis=1) - mask_i
        n_valid = cnt_j.sum(axis=1)
        inv = 1 - mask_i.reshape(I, R * m)
        inv_prefix = np.cumsum(inv, axis=1) - inv
        rank = np.where(
            flat, (offset_j[:, None, :] + prefix_r).reshape(I, -1),
            n_valid[:, None] + inv_prefix)
        np.testing.assert_array_equal(rank, rank_ref, err_msg=f"trial {trial}")

    table = rng.standard_normal((I, R * m, 4)).astype(np.float32)
    sel = jnp.asarray(order[:, :cap])
    rank_j = jnp.asarray(rank)
    a = gather_rows(jnp.asarray(table), sel)
    b = pack_rows(jnp.asarray(table), rank_j, cap)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ga = jax.grad(lambda t: (gather_rows(t, sel) ** 2).sum())(jnp.asarray(table))
    gb = jax.grad(lambda t: (pack_rows(t, rank_j, cap) ** 2).sum())(jnp.asarray(table))
    np.testing.assert_array_equal(np.asarray(ga), np.asarray(gb))


def test_render_voxel_validity_coincides_when_all_covering():
    """validity='voxel' end-to-end through PointNeRF.render: with a voxel
    grid whose one cell (+ kernel window) covers the whole AABB, every
    in-AABB sample is voxel-valid, and the knn radius
    (r * max(scaled_voxel_size) = 2 * 2 = 4) likewise accepts everything —
    the two semantics provably coincide, so the renders must be identical.
    Pins the voxel occupancy plumbing (grid build per view, query reshape
    in _render_core) against the knn path the torch oracle pins."""
    opts = pointnerf_default_options(num_points=16, feat_dim=8)
    opts = dataclasses.replace(
        opts,
        voxel_grid=dataclasses.replace(
            opts.voxel_grid, voxel_size=(1.0, 1.0, 1.0),
            voxel_scale=(2.0, 2.0, 2.0),
        ),
        renderer=dataclasses.replace(opts.renderer, depth_resolution=16),
        aggregator=dataclasses.replace(opts.aggregator, max_shading_pts=6),
        default_resolution=8,
    )
    coords = jax.random.uniform(
        jax.random.PRNGKey(1), (1, 16, 3), minval=-0.4, maxval=0.4
    )
    feats = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 8)) * 0.2
    extr, intr = random_cameras(2, 8, seed=3)
    extr, intr = jnp.asarray(extr)[None], jnp.asarray(intr)[None]

    outs = {}
    for validity in ("knn", "voxel"):
        pn = PointNeRF(
            n_obj=1, feats_dim=8, num_points=16, opts=opts,
            render_config=PointNeRFRenderConfig(
                eval_ray_chunk=32, validity=validity,
            ),
        )
        params = pn.init_params(jax.random.PRNGKey(0))
        out = pn.render(params, coords, feats, extr, intr, resolution=8)
        outs[validity] = out
        assert np.isfinite(np.asarray(out["channels"])).all()
    # the ray-exit sample sits exactly ON the AABB face: floor() maps it
    # one cell out of the 1-voxel grid (voxel-invalid) while knn accepts
    # it — a measure-zero boundary disagreement contributing ~4e-5 via the
    # last (lowest-transmittance) sample; everything interior coincides
    np.testing.assert_allclose(
        np.asarray(outs["knn"]["channels"]),
        np.asarray(outs["voxel"]["channels"]), rtol=1e-3, atol=1e-3,
    )
    # mask is the composited opacity (float), same boundary caveat
    np.testing.assert_allclose(
        np.asarray(outs["knn"]["mask"]), np.asarray(outs["voxel"]["mask"]),
        rtol=1e-2, atol=1e-3,
    )


def test_render_voxel_validity_excludes_unoccupied():
    """A far-away point cluster: samples near the rays' AABB crossing are
    in unoccupied voxel windows AND outside the knn radius under the
    production-scale grid — both semantics yield empty masks (and the
    voxel path exercises its real partial-occupancy grid)."""
    opts = pointnerf_default_options(num_points=8, feat_dim=8)
    opts = dataclasses.replace(
        opts,
        renderer=dataclasses.replace(opts.renderer, depth_resolution=12),
        aggregator=dataclasses.replace(opts.aggregator, max_shading_pts=4),
        default_resolution=8,
    )
    # cloud in one corner; cameras look at the origin
    coords = jnp.full((1, 8, 3), 0.9) + jax.random.uniform(
        jax.random.PRNGKey(1), (1, 8, 3), minval=0.0, maxval=0.05
    )
    coords = jnp.clip(coords, -0.99, 0.99)
    feats = jnp.zeros((1, 8, 8))
    extr, intr = random_cameras(1, 8, seed=5)
    extr, intr = jnp.asarray(extr)[None], jnp.asarray(intr)[None]
    masks = {}
    for validity in ("knn", "voxel"):
        pn = PointNeRF(
            n_obj=1, feats_dim=8, num_points=8, opts=opts,
            render_config=PointNeRFRenderConfig(
                eval_ray_chunk=32, validity=validity,
            ),
        )
        params = pn.init_params(jax.random.PRNGKey(0))
        out = pn.render(params, coords, feats, extr, intr, resolution=8)
        masks[validity] = np.asarray(out["mask"])
    # both reject the empty region around the origin-crossing rays; the
    # corner cloud may or may not be grazed identically, so compare only
    # that the voxel mask is a sane subset-of-or-equal structure
    assert masks["voxel"].sum() <= masks["knn"].sum() + 8
