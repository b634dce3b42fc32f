from .dataset import DepthDataset, DepthDataLoader
from .transforms import normalize_image

__all__ = ["DepthDataset", "DepthDataLoader", "normalize_image"]
