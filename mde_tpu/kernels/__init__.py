from .chamfer import chamfer_1d_pallas

__all__ = ["chamfer_1d_pallas"]
