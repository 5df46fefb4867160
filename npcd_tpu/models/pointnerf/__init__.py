from .ray_sampler import generate_rays
from .math_utils import get_ray_limits_box
from .pointnerf import PointNeRF, PointNeRFRenderConfig
