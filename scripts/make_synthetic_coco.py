#!/usr/bin/env python
"""Generate a tiny learnable COCO-format instance dataset on disk.

VERDICT r4 next #5: prove the rebuilt detector trainer *moves mAP* —
train (scripts/train_detector.py) -> eval (scripts/eval_detector.py) had
never been composed. Scenes are solid-color rectangles on a textured grey
background; category is keyed by SHAPE-INDEPENDENT color (cat 0 = red-ish,
cat 1 = blue-ish), so a from-scratch detector can overfit the set in a few
hundred steps and the box/segm mAP must move off ~0.

Usage: python scripts/make_synthetic_coco.py OUT_ROOT [--n 12] [--hw 320,400]
"""

import argparse
import json
import os

import numpy as np
from PIL import Image


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_root")
    ap.add_argument("--n", type=int, default=12)
    ap.add_argument("--hw", default="320,400")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    h, w = (int(v) for v in args.hw.split(","))

    img_dir = os.path.join(args.out_root, "images")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    images, annotations = [], []
    ann_id = 1
    colors = [np.array([210, 40, 40]), np.array([40, 60, 210])]  # cat 0 / 1
    for i in range(args.n):
        img = rng.integers(90, 130, (h, w, 3)).astype(np.float32)
        n_obj = int(rng.integers(1, 4))
        for _ in range(n_obj):
            bw = int(rng.uniform(0.15, 0.35) * w)
            bh = int(rng.uniform(0.15, 0.35) * h)
            x0 = int(rng.uniform(0, w - bw))
            y0 = int(rng.uniform(0, h - bh))
            cat = int(rng.integers(2))
            jitter = rng.uniform(-20, 20, 3)
            img[y0:y0 + bh, x0:x0 + bw] = colors[cat] + jitter
            annotations.append(dict(
                id=ann_id, image_id=i + 1, category_id=cat,
                bbox=[x0, y0, bw, bh], iscrowd=0,
                segmentation=[[x0, y0, x0 + bw, y0, x0 + bw, y0 + bh,
                               x0, y0 + bh]]))
            ann_id += 1
        name = f"im{i:04d}.png"
        Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(
            os.path.join(img_dir, name))
        images.append(dict(id=i + 1, file_name=name, height=h, width=w))
    coco = dict(images=images, annotations=annotations,
                categories=[dict(id=0), dict(id=1)])
    ann_path = os.path.join(args.out_root, "inst.json")
    with open(ann_path, "w") as f:
        json.dump(coco, f)
    print(f"wrote {args.n} images / {ann_id - 1} annotations under {args.out_root}")


if __name__ == "__main__":
    main()
