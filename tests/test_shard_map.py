"""Explicit shard_map DP step test on 8 fake devices."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from npcd_tpu.models.diffusion import DiffusionModel
from npcd_tpu.parallel import make_mesh
from npcd_tpu.parallel.shard_map_step import make_shard_map_diffusion_step
from npcd_tpu.train.diffusion_training import DiffusionTrainState
from npcd_tpu.utils.ema import EmaConfig


def test_shard_map_step_runs_and_updates():
    model = DiffusionModel(coords_dim=3, feats_dim=4, num_points=16,
                           width=32, layers=1, heads=2, attn_impl="einsum")
    tx = optax.adamw(1e-3)
    d = model.init(jax.random.PRNGKey(0))
    state = DiffusionTrainState(
        params=d.params, opt_state=tx.init(d.params),
        ema_params=(jax.tree_util.tree_map(jnp.copy, d.params),),
        step=jnp.zeros((), jnp.int32),
        coords_norm=d.coords_norm, feats_norm=d.feats_norm,
    )
    mesh = make_mesh()
    step = make_shard_map_diffusion_step(
        model, tx, (EmaConfig(min_value=0.9, max_value=0.9),), mesh
    )
    batch = {
        "coords": jax.random.normal(jax.random.PRNGKey(1), (8, 3, 16)),
        "feats": jax.random.normal(jax.random.PRNGKey(2), (8, 4, 16)),
    }
    new, metrics = step(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new.step) == 1
    # params actually moved, and identically on every "device" (replicated out)
    delta = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), new.params, state.params
    )
    assert max(jax.tree_util.tree_leaves(delta)) > 0
