#!/usr/bin/env python
"""Generate a synthetic-but-learnable NYU-format depth dataset on disk.

VERDICT r3 next #1: the framework needs a real *training* run — loss going
down, validation abs_rel improving, best-checkpoint + resume exercised — but
real NYUD2 is not present in this environment. This script builds a dataset in
the exact reference on-disk format (scene dirs of rgb_*.jpg + sync_depth_*.png
uint16 mm, train/eval filename lists with focal — reference train.py:313-360 /
dataloader.py:98-152), whose depth is a deterministic smooth function of image
color, so a depth network genuinely has something to learn and JPEG noise
doesn't destroy the signal.

Scene construction per image:
  - depth: a tilted background plane (3..9 m) + K random axis-aligned
    rectangles at nearer depths (1..6 m), lightly smoothed.
  - rgb: a fixed smooth colormap of depth (R ramps up with depth, G ramps
    down, B is a low-frequency sinusoid of depth) plus small texture noise.

Usage:
  python scripts/make_synthetic_nyu.py OUT_ROOT [--n-train 192] [--n-eval 16]

Writes:
  OUT_ROOT/sync/scene_{i//32}/rgb_{i}.jpg / sync_depth_{i}.png (train)
  OUT_ROOT/eval/scene_e/rgb_{i}.jpg / sync_depth_{i}.png       (eval)
  OUT_ROOT/train_files.txt, OUT_ROOT/eval_files.txt
  OUT_ROOT/params.txt  — ready to pass to `python train.py`
"""

import argparse
import os
import sys

import numpy as np
from PIL import Image

H, W = 480, 640
FOCAL = 518.8579


def depth_to_rgb(depth: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Deterministic smooth colormap (plus mild texture noise) a network can
    invert locally: depth in meters -> uint8 HWC rgb."""
    t = (depth - 1.0) / 9.0  # 0..1 over the 1..10 m range
    r = 30 + 200 * t
    g = 230 - 200 * t
    b = 128 + 90 * np.sin(6.0 * t)
    rgb = np.stack([r, g, b], axis=-1)
    rgb = rgb + rng.normal(0.0, 4.0, rgb.shape)
    return np.clip(rgb, 0, 255).astype(np.uint8)


def make_scene(rng: np.random.Generator) -> np.ndarray:
    """Random depth map in meters: tilted plane + nearer rectangles."""
    yy = np.linspace(0.0, 1.0, H)[:, None]
    xx = np.linspace(0.0, 1.0, W)[None, :]
    base = 3.0 + 5.0 * (rng.uniform(0.2, 1.0) * yy
                        + rng.uniform(-0.3, 0.3) * xx) + rng.uniform(0.0, 1.0)
    depth = np.broadcast_to(base, (H, W)).copy()
    for _ in range(rng.integers(3, 8)):
        h = int(rng.uniform(40, 200))
        w = int(rng.uniform(40, 200))
        y0 = int(rng.uniform(0, H - h))
        x0 = int(rng.uniform(0, W - w))
        d = rng.uniform(1.0, 6.0)
        depth[y0:y0 + h, x0:x0 + w] = d
    # light smoothing so object borders aren't single-pixel cliffs
    k = 5
    pad = np.pad(depth, k // 2, mode="edge")
    sm = np.zeros_like(depth)
    for dy in range(k):
        for dx in range(k):
            sm += pad[dy:dy + H, dx:dx + W]
    depth = sm / (k * k)
    return np.clip(depth, 1.0, 9.9)


def write_split(root: str, prefix: str, n: int, seed: int, lines: list):
    for i in range(n):
        rng = np.random.default_rng(np.random.SeedSequence([seed, i]))
        depth = make_scene(rng)
        rgb = depth_to_rgb(depth, rng)
        scene = f"scene_{prefix}{i // 32}"
        d = os.path.join(root, scene)
        os.makedirs(d, exist_ok=True)
        Image.fromarray(rgb).save(os.path.join(d, f"rgb_{i:05d}.jpg"),
                                  quality=95)
        mm = (depth * 1000.0).astype(np.uint16)
        Image.fromarray(mm).save(
            os.path.join(d, f"sync_depth_{i:05d}.png"))
        lines.append(f"{scene}/rgb_{i:05d}.jpg {scene}/sync_depth_{i:05d}.png {FOCAL}")


PARAMS_TEMPLATE = """--bs {bs}
--dataset nyu
--lr 0.000357
--wd 0.1
--div_factor 25
--final_div_factor 100
--epochs {epochs}
--workers 4
--name synth_convergence
--n_bins 256
--norm linear
--w_chamfer 0.1
--root {root}/runs
--data_path {root}/sync/
--gt_path {root}/sync/
--filenames_file {root}/train_files.txt
--input_height 416
--input_width 544
--min_depth 0.001
--max_depth 10
--do_random_rotate
--degree 2.5
--validate_every {validate_every}
--data_path_eval {root}/eval/
--gt_path_eval {root}/eval/
--filenames_file_eval {root}/eval_files.txt
--min_depth_eval 1e-3
--max_depth_eval 10
--eigen_crop
--encoder_name efficientnet-b1
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_root")
    ap.add_argument("--n-train", type=int, default=192)
    ap.add_argument("--n-eval", type=int, default=16)
    ap.add_argument("--bs", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--validate-every", type=int, default=100)
    args = ap.parse_args()

    root = os.path.abspath(args.out_root)
    train_lines, eval_lines = [], []
    write_split(os.path.join(root, "sync"), "", args.n_train, 100, train_lines)
    write_split(os.path.join(root, "eval"), "e", args.n_eval, 200, eval_lines)
    with open(os.path.join(root, "train_files.txt"), "w") as f:
        f.write("\n".join(train_lines) + "\n")
    with open(os.path.join(root, "eval_files.txt"), "w") as f:
        f.write("\n".join(eval_lines) + "\n")
    with open(os.path.join(root, "params.txt"), "w") as f:
        f.write(PARAMS_TEMPLATE.format(root=root, bs=args.bs,
                                       epochs=args.epochs,
                                       validate_every=args.validate_every))
    print(f"wrote {args.n_train} train + {args.n_eval} eval images under {root}")
    print(f"params file: {os.path.join(root, 'params.txt')}")


if __name__ == "__main__":
    main()
