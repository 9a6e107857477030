from .dataset import DepthDataset, split_train_val
from .loader import HostLoader
from . import transforms, synthetic

__all__ = ["DepthDataset", "split_train_val", "HostLoader", "transforms", "synthetic"]
