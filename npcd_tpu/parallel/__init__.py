from .mesh import make_mesh, data_sharding, replicated_sharding, shard_batch, replicate
from .pointnerf_sharding import (
    pointnerf_param_specs,
    pointnerf_param_shardings,
    shard_pointnerf_params,
)
from .tp import denoiser_param_specs, denoiser_param_shardings, shard_denoiser_params
from .tp_step import (
    make_tp_diffusion_train_step,
    shard_train_state,
    train_state_specs,
)
