import sys, time
import jax, jax.numpy as jnp
from npcd_tpu.data.synthetic import random_cameras
from npcd_tpu.losses import PointNeRFLossWeights
from npcd_tpu.models.pointnerf import PointNeRF, PointNeRFRenderConfig
from npcd_tpu.train.pointnerf_training import (
    PointNeRFTrainState, make_pointnerf_optimizer, make_pointnerf_train_step)
from npcd_tpu.utils.config import pointnerf_default_options

ic = int(sys.argv[1]); budget = int(sys.argv[2])
b, v, res, p, n_obj = 8, 50, 128, 512, 2347
opts = pointnerf_default_options()
cfg = PointNeRFRenderConfig(train_rays=112, train_instance_chunk=ic,
                            compute_dtype=jnp.bfloat16, shading_budget=budget)
pn = PointNeRF(n_obj=n_obj, feats_dim=32, num_points=p, opts=opts, render_config=cfg)
params = pn.init_params(jax.random.PRNGKey(0))
coords = jax.random.uniform(jax.random.PRNGKey(1), (n_obj, p, 3), minval=-0.4, maxval=0.4)
params = pn.set_all_coords(params, coords)
tx = make_pointnerf_optimizer(1e-3)
state = PointNeRFTrainState(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))
step = make_pointnerf_train_step(pn, tx, PointNeRFLossWeights(1.0, 1e-7, 3.5e-7))
extr, intr = random_cameras(v, res, seed=0)
feed = {
    "obj_idx": jnp.arange(b),
    "images": jnp.ones((b, v, res * res, 3)) * 0.5,
    "intrinsics": jnp.tile(jnp.asarray(intr)[None], (b, 1, 1, 1)),
    "extrinsics": jnp.tile(jnp.asarray(extr)[None], (b, 1, 1, 1)),
}
state, metrics = step(state, feed, jax.random.PRNGKey(2))
float(metrics["loss"])
t0 = time.perf_counter()
for i in range(10):
    state, metrics = step(state, feed, jax.random.fold_in(jax.random.PRNGKey(3), i))
float(metrics["loss"])
dt = (time.perf_counter() - t0) / 10
print(f"ic={ic} budget={budget}: {1/dt:.3f} steps/s")
