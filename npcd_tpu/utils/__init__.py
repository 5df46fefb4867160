from .config import load_config, print_config, pointnerf_default_options
from .util import chunks, split_num, to_numpy, count_parameters, psnr
from . import logging
