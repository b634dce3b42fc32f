from .resize import resize_bilinear_align_corners, resize_nearest
from .bins import bin_edges_from_widths, bin_centers, depth_from_bins
from .losses import silog_loss, bins_chamfer_loss
from .metrics import compute_errors

__all__ = [
    "resize_bilinear_align_corners", "resize_nearest",
    "bin_edges_from_widths", "bin_centers", "depth_from_bins",
    "silog_loss", "bins_chamfer_loss",
    "compute_errors",
]
