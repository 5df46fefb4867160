"""Distributed tests without hardware: 8 fake CPU devices
(SURVEY.md §4 item 4). DP-sharded train steps must match single-device."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from npcd_tpu.models.diffusion import DiffusionModel
from npcd_tpu.parallel import make_mesh, replicate, shard_batch
from npcd_tpu.train.diffusion_training import (
    DiffusionTrainState,
    make_diffusion_train_step,
)
from npcd_tpu.utils.ema import EmaConfig


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def _make_state(model, tx):
    dstate = model.init(jax.random.PRNGKey(0))
    return DiffusionTrainState(
        params=dstate.params,
        opt_state=tx.init(dstate.params),
        ema_params=(jax.tree_util.tree_map(jnp.copy, dstate.params),),
        step=jnp.zeros((), jnp.int32),
        coords_norm=dstate.coords_norm,
        feats_norm=dstate.feats_norm,
    )


def test_stage1_dp_train_step_matches_single_device():
    """Stage-1 (PointNeRF) DP: object batch sharded over 8 devices must
    reproduce the single-device step exactly (params, loss, embedding-table
    grads through the gather/scatter-add)."""
    import dataclasses

    from npcd_tpu.losses import PointNeRFLossWeights
    from npcd_tpu.models.pointnerf import PointNeRF, PointNeRFRenderConfig
    from npcd_tpu.train.pointnerf_training import (
        PointNeRFTrainState,
        make_pointnerf_optimizer,
        make_pointnerf_train_step,
    )
    from npcd_tpu.data.synthetic import random_cameras
    from npcd_tpu.utils.config import pointnerf_default_options

    n_obj, p, v, res = 8, 32, 2, 16
    opts = pointnerf_default_options(num_points=p, feat_dim=8)
    opts = dataclasses.replace(
        opts,
        renderer=dataclasses.replace(opts.renderer, depth_resolution=24,
                                     ray_subsamples=32),
        aggregator=dataclasses.replace(opts.aggregator, max_shading_pts=8),
        default_resolution=res,
    )
    pn = PointNeRF(n_obj=n_obj, feats_dim=8, num_points=p, opts=opts,
                   render_config=PointNeRFRenderConfig(
                       train_rays=16, train_instance_chunk=v * 8))
    params = pn.init_params(jax.random.PRNGKey(0))
    coords = jax.random.uniform(jax.random.PRNGKey(1), (n_obj, p, 3),
                                minval=-0.4, maxval=0.4)
    params = pn.set_all_coords(params, coords)
    tx = make_pointnerf_optimizer(1e-3)

    extr, intr = random_cameras(v, res, seed=0)
    batch = {
        "obj_idx": jnp.arange(n_obj),
        "images": jax.random.uniform(jax.random.PRNGKey(2), (n_obj, v, res * res, 3)),
        "intrinsics": jnp.tile(jnp.asarray(intr)[None], (n_obj, 1, 1, 1)),
        "extrinsics": jnp.tile(jnp.asarray(extr)[None], (n_obj, 1, 1, 1)),
    }
    rng = jax.random.PRNGKey(3)
    step = make_pointnerf_train_step(
        pn, tx, PointNeRFLossWeights(1.0, 1e-7, 3.5e-7), donate=False)

    def make_state():
        return PointNeRFTrainState(params=params, opt_state=tx.init(params),
                                   step=jnp.zeros((), jnp.int32))

    ref_new, ref_metrics = step(make_state(), batch, rng)

    mesh = make_mesh()
    dp_state = replicate(make_state(), mesh)
    dp_batch = shard_batch(batch, mesh)
    dp_new, dp_metrics = step(dp_state, dp_batch, rng)

    assert float(dp_metrics["loss"]) == pytest.approx(
        float(ref_metrics["loss"]), rel=1e-5)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(ref_new.params)[0],
        jax.tree_util.tree_flatten_with_path(dp_new.params)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6,
            err_msg=jax.tree_util.keystr(path))


def test_dp_train_step_matches_single_device():
    model = DiffusionModel(coords_dim=3, feats_dim=4, num_points=16,
                           width=32, layers=1, heads=2, attn_impl="einsum")
    tx = optax.adamw(1e-3)
    ema_cfgs = (EmaConfig(power=1.0, min_value=0.9, max_value=0.9),)
    step = make_diffusion_train_step(model, tx, ema_cfgs, donate=False)

    batch = {
        "coords": jax.random.normal(jax.random.PRNGKey(1), (8, 3, 16)),
        "feats": jax.random.normal(jax.random.PRNGKey(2), (8, 4, 16)),
    }
    rng = jax.random.PRNGKey(3)

    state_single = _make_state(model, tx)
    new_single, metrics_single = step(state_single, batch, rng)

    mesh = make_mesh()
    state_dp = replicate(_make_state(model, tx), mesh)
    batch_dp = shard_batch(batch, mesh)
    new_dp, metrics_dp = step(state_dp, batch_dp, rng)

    assert float(metrics_single["loss"]) == pytest.approx(
        float(metrics_dp["loss"]), rel=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(new_single.params),
        jax.tree_util.tree_leaves(new_dp.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
    # EMA updated inside the same jitted step
    for a, b in zip(
        jax.tree_util.tree_leaves(new_single.ema_params[0]),
        jax.tree_util.tree_leaves(new_dp.ema_params[0]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_stage1_sharded_embedding_tables_match_single_device():
    """Embedding tables row-sharded over the 'data' axis (the dominant
    stage-1 state) must reproduce the single-device step; MLPs replicated.
    New capability vs the single-GPU reference (SURVEY.md §2.10)."""
    import dataclasses

    from npcd_tpu.losses import PointNeRFLossWeights
    from npcd_tpu.models.pointnerf import PointNeRF, PointNeRFRenderConfig
    from npcd_tpu.parallel import (
        pointnerf_param_shardings,
        shard_pointnerf_params,
    )
    from npcd_tpu.train.pointnerf_training import (
        PointNeRFTrainState,
        make_pointnerf_optimizer,
        make_pointnerf_train_step,
    )
    from npcd_tpu.data.synthetic import random_cameras
    from npcd_tpu.utils.config import pointnerf_default_options

    n_obj, p, v, res = 8, 32, 2, 16
    opts = pointnerf_default_options(num_points=p, feat_dim=8)
    opts = dataclasses.replace(
        opts,
        renderer=dataclasses.replace(opts.renderer, depth_resolution=24,
                                     ray_subsamples=32),
        aggregator=dataclasses.replace(opts.aggregator, max_shading_pts=8),
        default_resolution=res,
    )
    pn = PointNeRF(n_obj=n_obj, feats_dim=8, num_points=p, opts=opts,
                   render_config=PointNeRFRenderConfig(
                       train_rays=16, train_instance_chunk=v * 8))
    params = pn.init_params(jax.random.PRNGKey(0))
    coords = jax.random.uniform(jax.random.PRNGKey(1), (n_obj, p, 3),
                                minval=-0.4, maxval=0.4)
    params = pn.set_all_coords(params, coords)
    tx = make_pointnerf_optimizer(1e-3)
    extr, intr = random_cameras(v, res, seed=0)
    batch = {
        "obj_idx": jnp.arange(n_obj),
        "images": jax.random.uniform(jax.random.PRNGKey(2), (n_obj, v, res * res, 3)),
        "intrinsics": jnp.tile(jnp.asarray(intr)[None], (n_obj, 1, 1, 1)),
        "extrinsics": jnp.tile(jnp.asarray(extr)[None], (n_obj, 1, 1, 1)),
    }
    rng = jax.random.PRNGKey(3)
    step = make_pointnerf_train_step(
        pn, tx, PointNeRFLossWeights(1.0, 1e-7, 3.5e-7), donate=False)

    ref_new, ref_metrics = step(
        PointNeRFTrainState(params=params, opt_state=tx.init(params),
                            step=jnp.zeros((), jnp.int32)), batch, rng)

    mesh = make_mesh()
    params_sh = shard_pointnerf_params(params, mesh)
    batch_sh = shard_batch(batch, mesh)
    state_sh = PointNeRFTrainState(
        params=params_sh, opt_state=tx.init(params_sh),
        step=jnp.zeros((), jnp.int32))
    sh_new, sh_metrics = step(state_sh, batch_sh, rng)

    assert float(sh_metrics["loss"]) == pytest.approx(
        float(ref_metrics["loss"]), rel=1e-5)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(ref_new.params)[0],
        jax.tree_util.tree_flatten_with_path(sh_new.params)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6,
            err_msg=jax.tree_util.keystr(path))
    # updated tables keep their row sharding
    want = pointnerf_param_shardings(params, mesh)
    for got_leaf, want_leaf, (kp, _) in zip(
        jax.tree_util.tree_leaves(sh_new.params),
        jax.tree_util.tree_leaves(want),
        jax.tree_util.tree_flatten_with_path(params)[0],
    ):
        if "table" in jax.tree_util.keystr(kp):
            assert got_leaf.sharding.is_equivalent_to(want_leaf, got_leaf.ndim), (
                jax.tree_util.keystr(kp), got_leaf.sharding)


def test_dp_step_collective_traffic_is_one_grad_psum():
    """The DP train step's cross-device traffic should be exactly the
    gradient reduction: all all-reduce bytes in the compiled HLO sum to
    ~1x the trainable parameter bytes (plus scalar metrics), and there are
    no all-gathers of parameters or activations. This is the communication
    model behind the linear-DP-scaling projection in docs/PERF.md."""
    import re

    model = DiffusionModel(coords_dim=3, feats_dim=4, num_points=16,
                           width=32, layers=1, heads=2, attn_impl="einsum")
    tx = optax.adamw(1e-3)
    ema_cfgs = (EmaConfig(power=1.0, min_value=0.9, max_value=0.9),)
    step = make_diffusion_train_step(model, tx, ema_cfgs, donate=False)

    batch = {
        "coords": jax.random.normal(jax.random.PRNGKey(1), (8, 3, 16)),
        "feats": jax.random.normal(jax.random.PRNGKey(2), (8, 4, 16)),
    }
    mesh = make_mesh()
    state_dp = replicate(_make_state(model, tx), mesh)
    batch_dp = shard_batch(batch, mesh)
    hlo = (
        jax.jit(step)
        .lower(state_dp, batch_dp, jax.random.PRNGKey(3))
        .compile()
        .as_text()
    )

    assert "all-gather" not in hlo, [
        l.strip() for l in hlo.splitlines() if "all-gather" in l
    ][:5]

    n_params = sum(
        x.size for x in jax.tree_util.tree_leaves(state_dp.params)
    )
    # XLA emits ONE all-reduce whose output tuple holds every grad leaf
    # (plus scalar metric reductions): sum the element counts of all
    # all-reduce definition outputs, e.g.
    #   %all-reduce.26 = (f32[96,32]{1,0}, f32[32]{0}, ...) all-reduce(...)
    ar_elems = 0
    n_ar = 0
    for m in re.finditer(r"= (\([^)]*\)|\S+) all-reduce\(", hlo):
        n_ar += 1
        for shape in re.findall(r"f32\[([0-9,]*)\]", m.group(1)):
            if not shape:
                ar_elems += 1  # scalar (loss/grad-norm metrics)
                continue
            n = 1
            for d in shape.split(","):
                n *= int(d)
            ar_elems += n
    assert n_ar >= 1, "no all-reduce found in the compiled DP step"
    # one psum over every grad leaf + a handful of scalar metric psums
    assert n_params <= ar_elems <= n_params + 64, (n_params, ar_elems, n_ar)
