from .registry import register_dataset, list_datasets, get_dataset_class
from .factory import create_dataset
from .dataset import Dataset, BatchLoader
from .pointnerf_dataset import PointNeRFDataset
from . import srn  # noqa: F401  (registers SRN datasets)
from . import synthetic  # noqa: F401  (registers synthetic test datasets)
