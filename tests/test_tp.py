"""Tensor-parallel (Megatron-style GSPMD) denoiser tests on 8 fake devices.

Verifies npcd_tpu/parallel/tp.py: TP-sharded params produce the same
forward output, gradients, and full train-step results as single-device.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from npcd_tpu.models.diffusion import DiffusionModel
from npcd_tpu.parallel.tp import (
    denoiser_param_shardings,
    denoiser_param_specs,
    shard_denoiser_params,
)
from npcd_tpu.train.diffusion_training import (
    DiffusionTrainState,
    make_diffusion_train_step,
)
from npcd_tpu.utils.ema import EmaConfig


def _model():
    # heads=4, width=32 -> head_dim 8; tp=2 splits heads 2/2
    return DiffusionModel(coords_dim=3, feats_dim=4, num_points=16,
                          width=32, layers=2, heads=4, attn_impl="einsum")


def _mesh(dp, tp):
    devices = np.asarray(jax.devices()[: dp * tp]).reshape(dp, tp)
    return Mesh(devices, ("data", "model"))


def test_tp_specs_cover_expected_modules():
    model = _model()
    params = model.init(jax.random.PRNGKey(0)).params
    specs = denoiser_param_specs(params)
    flat = jax.tree_util.tree_flatten_with_path(specs)[0]
    col = row = 0
    for path, spec in flat:
        names = [getattr(k, "key", str(k)) for k in path]
        if spec == P(None, "model"):
            assert names[-2] in ("c_qkv", "c_fc"), names
            col += 1
        elif spec == P("model", None):
            assert names[-2] == "c_proj", names
            row += 1
    # 2 blocks x (qkv + fc) kernels + time_embed fc kernel = 5 column kernels
    assert col >= 5 and row >= 5


def test_tp_forward_matches_single_device():
    model = _model()
    dstate = model.init(jax.random.PRNGKey(0))
    coords = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 16))
    feats = jax.random.normal(jax.random.PRNGKey(2), (4, 4, 16))
    t = jnp.array([0, 10, 100, 999], jnp.int32)

    ref_c, ref_f = model.denoiser.apply({"params": dstate.params}, coords, feats, t)

    mesh = _mesh(dp=4, tp=2)
    with jax.set_mesh(mesh):
        params_tp = shard_denoiser_params(dstate.params, mesh)
        tp_c, tp_f = jax.jit(
            lambda p, c, f, tt: model.denoiser.apply({"params": p}, c, f, tt)
        )(params_tp, coords, feats, t)

    np.testing.assert_allclose(np.asarray(ref_c), np.asarray(tp_c),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ref_f), np.asarray(tp_f),
                               rtol=1e-5, atol=1e-5)


def test_tp_train_step_matches_single_device():
    model = _model()
    tx = optax.adamw(1e-3)
    ema_cfgs = (EmaConfig(min_value=0.9, max_value=0.9),)
    step = make_diffusion_train_step(model, tx, ema_cfgs, donate=False)
    batch = {
        "coords": jax.random.normal(jax.random.PRNGKey(1), (8, 3, 16)),
        "feats": jax.random.normal(jax.random.PRNGKey(2), (8, 4, 16)),
    }
    rng = jax.random.PRNGKey(3)

    def make_state(params):
        d = model.init(jax.random.PRNGKey(0))
        return DiffusionTrainState(
            params=params, opt_state=tx.init(params),
            ema_params=(jax.tree_util.tree_map(jnp.copy, params),),
            step=jnp.zeros((), jnp.int32),
            coords_norm=d.coords_norm, feats_norm=d.feats_norm,
        )

    base_params = model.init(jax.random.PRNGKey(0)).params
    ref_new, ref_metrics = step(make_state(base_params), batch, rng)

    mesh = _mesh(dp=4, tp=2)
    params_tp = shard_denoiser_params(base_params, mesh)
    batch_tp = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("data"))), batch
    )
    with jax.set_mesh(mesh):
        tp_new, tp_metrics = step(make_state(params_tp), batch_tp, rng)

    assert float(tp_metrics["loss"]) == pytest.approx(
        float(ref_metrics["loss"]), rel=1e-5
    )
    # updated params keep the TP shardings and match single-device numerics
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(ref_new.params)[0],
        jax.tree_util.tree_flatten_with_path(tp_new.params)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6,
            err_msg=jax.tree_util.keystr(path),
        )
    shardings = denoiser_param_shardings(base_params, mesh)
    for got, want in zip(
        jax.tree_util.tree_leaves(tp_new.params),
        jax.tree_util.tree_leaves(shardings),
    ):
        assert got.sharding.is_equivalent_to(want, got.ndim), (
            got.sharding, want)
