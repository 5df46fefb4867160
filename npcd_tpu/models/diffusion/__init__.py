from .schedule import DiffusionSchedule, get_beta_schedule, make_schedule
from .normalizers import (
    NormalizerStats,
    fit_unit_gaussian,
    fit_minus_one_to_one,
    normalize,
    denormalize,
)
from .transformer import NPCDTransformer, timestep_embedding
from .gaussian_diffusion import GaussianDiffusion
from .diffusion_model import DiffusionModel, DiffusionState
