from .running_average import RunningAverage, RunningAverageDict
from .misc import denormalize, colorize, count_parameters, setup_exp_dir
from .pointcloud import b64_to_pil, edges, PointCloudHelper

__all__ = ["RunningAverage", "RunningAverageDict", "denormalize", "colorize",
           "count_parameters", "setup_exp_dir", "b64_to_pil", "edges",
           "PointCloudHelper"]
