from .efficientnet import EfficientNetEncoder, EFFICIENTNET_CONFIGS
from .unet_adaptive_bins import UnetAdaptiveBins, get_num_channels_to_add, build_model

__all__ = ["EfficientNetEncoder", "EFFICIENTNET_CONFIGS", "UnetAdaptiveBins",
           "get_num_channels_to_add", "build_model"]
