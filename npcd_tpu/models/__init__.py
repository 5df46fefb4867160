from .npcd import NPCD
from .pointnerf import PointNeRF, PointNeRFRenderConfig
from .diffusion import DiffusionModel, DiffusionState
