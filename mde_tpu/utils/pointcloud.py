"""Demo utilities: base64 decode, depth-edge magnitudes, depth -> point cloud
(reference utils.py:143-181).

The point-cloud unprojection assumes the Kinect-style NYUD2 field of view
(57 x 43 degrees) and a central principal point; `depth_to_points` masks
strong depth edges with NaN so stitched surfaces don't bridge occlusions in
the demo viewer.
"""

import base64
import math
import re
from io import BytesIO

import numpy as np


def b64_to_pil(b64string: str):
    """data-URL / raw base64 string -> PIL.Image (reference utils.py:144-147)."""
    from PIL import Image
    image_data = re.sub("^data:image/.+;base64,", "", b64string)
    return Image.open(BytesIO(base64.b64decode(image_data)))


def edges(d: np.ndarray) -> np.ndarray:
    """Sobel edge magnitude |dx| + |dy| (reference utils.py:154-157)."""
    from scipy import ndimage
    dx = ndimage.sobel(d, 0)
    dy = ndimage.sobel(d, 1)
    return np.abs(dx) + np.abs(dy)


class PointCloudHelper:
    """Unproject a depth map to camera-frame 3D points
    (reference utils.py:160-181)."""

    def __init__(self, width: int = 640, height: int = 480):
        self.xx, self.yy = self.world_coords(width, height)

    @staticmethod
    def world_coords(width: int = 640, height: int = 480):
        hfov_degrees, vfov_degrees = 57, 43
        h_fov = math.radians(hfov_degrees)
        v_fov = math.radians(vfov_degrees)
        cx, cy = width / 2, height / 2
        fx = width / (2 * math.tan(h_fov / 2))
        fy = height / (2 * math.tan(v_fov / 2))
        xx = (np.tile(np.arange(width), height) - cx) / fx
        yy = (np.repeat(np.arange(height), width) - cy) / fy
        return xx, yy

    # reference-name alias
    worldCoords = world_coords

    def depth_to_points(self, depth: np.ndarray) -> np.ndarray:
        """(H, W) depth -> (H*W, 3) points; depth edges > 0.3 become NaN.
        Mutates `depth` in place, as the reference does."""
        depth[edges(depth) > 0.3] = np.nan
        length = depth.shape[0] * depth.shape[1]
        z = depth.reshape(length)
        return np.dstack((self.xx * z, self.yy * z, z)).reshape((length, 3))
