from .chamfer import chamfer_1d_pallas
from .sharded import chamfer_1d_pallas_sharded, fused_bins_head_sharded

__all__ = ["chamfer_1d_pallas", "chamfer_1d_pallas_sharded",
           "fused_bins_head_sharded"]
