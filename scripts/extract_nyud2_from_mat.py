#!/usr/bin/env python
"""NYU Depth v2 official .mat -> per-scene rgb jpg + sync_depth uint16 png.

Capability of reference extract_official_train_test_set_from_mat.py:1-94:
reads nyu_depth_v2_labeled.mat + splits.mat, writes
<out>/<scene>/rgb_%05d.jpg and sync_depth_%05d.png (depth in millimetres,
uint16) with the 7-pixel registration border blacked out.

Usage: python scripts/extract_nyud2_from_mat.py nyu_depth_v2_labeled.mat splits.mat out_dir
"""

import os
import sys

import numpy as np


def convert(mat_path: str, splits_path: str, out_root: str):
    import h5py
    from PIL import Image
    from scipy.io import loadmat

    h5 = h5py.File(mat_path, "r")
    splits = loadmat(splits_path)
    test_idx = set(int(x) for x in splits["testNdxs"][:, 0])

    images = h5["images"]          # (N, 3, W, H) in HDF5 layout
    depths = h5["rawDepths"] if "rawDepths" in h5 else h5["depths"]
    scenes = ["".join(chr(c[0]) for c in h5[ref][:]) for ref in h5["sceneTypes"][0]] \
        if "sceneTypes" in h5 else None
    names = ["".join(chr(c[0]) for c in h5[ref][:]) for ref in h5["scenes"][0]] \
        if "scenes" in h5 else [f"scene_{i:04d}" for i in range(images.shape[0])]

    for i in range(images.shape[0]):
        split = "test" if (i + 1) in test_idx else "train"
        scene = names[i] if names else f"scene_{i:04d}"
        out_dir = os.path.join(out_root, split, scene)
        os.makedirs(out_dir, exist_ok=True)

        rgb = np.transpose(images[i], (2, 1, 0))          # -> H, W, 3
        depth = np.transpose(depths[i], (1, 0))           # -> H, W (metres)
        depth_mm = (depth * 1000.0).astype(np.uint16)

        # black 7-px registration border (reference
        # extract_official_train_test_set_from_mat.py:57-63)
        for arr in (rgb,):
            arr[:7, :] = 0
            arr[-7:, :] = 0
            arr[:, :7] = 0
            arr[:, -7:] = 0
        depth_mm[:7, :] = 0
        depth_mm[-7:, :] = 0
        depth_mm[:, :7] = 0
        depth_mm[:, -7:] = 0

        Image.fromarray(rgb).save(os.path.join(out_dir, f"rgb_{i:05d}.jpg"))
        Image.fromarray(depth_mm).save(os.path.join(out_dir, f"sync_depth_{i:05d}.png"))
        if i % 100 == 0:
            print(f"{i}/{images.shape[0]}")


if __name__ == "__main__":
    if len(sys.argv) != 4:
        sys.exit(__doc__)
    convert(sys.argv[1], sys.argv[2], sys.argv[3])
