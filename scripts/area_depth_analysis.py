#!/usr/bin/env python
"""Per-class instance-area vs mean-depth analysis
(reference misc_scripts/area_depth_std_data_handling.py:33-63 re-designed as a
CLI): consumes the stats pickle emitted by scripts/generate_instances.py
--stats-out (one list per ADE20K-places class of [area, depth_mean,
depth_std]) and writes one scatter plot + Pearson correlation per class, plus
a summary table.

Usage:
  python scripts/area_depth_analysis.py stats.pkl --out-dir scatterplots/
"""

import argparse
import os
import pickle

import numpy as np

ADE20K_CLASSES = [
    'bed', 'windowpane', 'cabinet', 'person', 'door',
    'table', 'curtain', 'chair', 'car', 'painting',
    'sofa', 'shelf', 'mirror', 'armchair', 'seat',
    'fence', 'desk', 'wardrobe', 'lamp', 'bathtub',
    'railing', 'cushion', 'box', 'column', 'signboard',
    'chest of drawers', 'counter', 'sink', 'fireplace', 'refrigerator',
    'stairs', 'case', 'pool table', 'pillow', 'screen door',
    'bookcase', 'coffee table', 'toilet', 'flower', 'book',
    'bench', 'countertop', 'stove', 'palm', 'kitchen island',
    'computer', 'swivel chair', 'boat', 'arcade machine', 'bus',
    'towel', 'light', 'truck', 'chandelier', 'awning',
    'streetlight', 'booth', 'television receiver', 'airplane', 'apparel',
    'pole', 'bannister', 'ottoman', 'bottle', 'van',
    'ship', 'fountain', 'washer', 'plaything', 'stool',
    'barrel', 'basket', 'bag', 'minibike', 'oven',
    'ball', 'food', 'step', 'trade name', 'microwave',
    'pot', 'animal', 'bicycle', 'dishwasher', 'screen',
    'sculpture', 'hood', 'sconce', 'vase', 'traffic light',
    'tray', 'ashcan', 'fan', 'plate', 'monitor',
    'bulletin board', 'radiator', 'glass', 'clock', 'flag',
    'background']

FRAME_PIXELS = 640 * 480


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("stats_pkl")
    ap.add_argument("--out-dir", default="./area_depth_scatterplots")
    ap.add_argument("--no-plots", action="store_true")
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot as plt
    import scipy.stats

    with open(args.stats_pkl, "rb") as f:
        data = pickle.load(f)
    os.makedirs(args.out_dir, exist_ok=True)

    print(f"{'class':26s} {'n':>6s} {'pearson_r':>10s} {'slope':>8s}")
    for i, insts in enumerate(data):
        pts = np.asarray([p for p in insts
                          if np.isfinite(p[0]) and np.isfinite(p[1])], dtype=np.float64)
        if len(pts) < 2:
            continue
        areas = pts[:, 0] / FRAME_PIXELS
        keep = areas > 0
        areas, depth_means = areas[keep], pts[keep, 1]
        if len(areas) < 2:
            continue
        corr, _ = scipy.stats.pearsonr(areas, depth_means)
        m, b = np.polyfit(areas, depth_means, 1)
        name = ADE20K_CLASSES[i] if i < len(ADE20K_CLASSES) else str(i)
        print(f"{name:26s} {len(areas):6d} {corr:10.3f} {m:8.2f}")

        if not args.no_plots:
            plt.plot(areas, depth_means, ',')
            plt.title(f"Class {i}: {name}, r={corr:.3f}")
            plt.xlabel("Area (proportion of frame)")
            plt.ylabel("Mean depth (m)")
            plt.xlim(left=0)
            plt.ylim(bottom=0)
            plt.savefig(os.path.join(args.out_dir, f"{i}_{name.replace(' ', '_')}.png"),
                        dpi=150)
            plt.clf()


if __name__ == "__main__":
    main()
