from .chamfer import chamfer_1d_pallas
from .dw_conv import dw_conv2d_pallas
from .sharded import chamfer_1d_pallas_sharded, fused_bins_head_sharded

__all__ = ["chamfer_1d_pallas", "chamfer_1d_pallas_sharded",
           "dw_conv2d_pallas", "fused_bins_head_sharded"]
