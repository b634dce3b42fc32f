from .running_average import RunningAverage, RunningAverageDict
from .misc import denormalize, colorize, count_parameters, setup_exp_dir

__all__ = ["RunningAverage", "RunningAverageDict", "denormalize", "colorize",
           "count_parameters", "setup_exp_dir"]
