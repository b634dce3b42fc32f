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


def make_scene_hard(rng: np.random.Generator):
    """VERDICT r4 next #7: a multi-factor scene a constant/trivial predictor
    cannot fit and whose *color is a pure distractor*. Depth is recoverable
    only from the cues real indoor scenes offer:
      - ground-plane geometry: floor depth = F*h_c/(y - horizon) below a
        per-scene horizon; wall at a per-scene random distance above it,
      - perspective size: upright boxes have a fixed world size, so their
        pixel size and floor-contact row encode their depth,
      - texture gradient: every surface carries a checker texture whose
        pixel period is F*t/d — near surfaces are coarse, far ones fine,
      - occlusion: boxes are painted far-to-near and overlap,
      - distractors: each box gets a random hue (color independent of
        depth), and flat "decals" are painted on the wall — appearance
        edges with NO depth edge.
    Returns (depth_m, rgb_u8)."""
    yy = np.arange(H, dtype=np.float32)[:, None]
    xx = np.arange(W, dtype=np.float32)[None, :]
    y_h = rng.uniform(0.30, 0.45) * H          # horizon row
    d_wall = rng.uniform(6.0, 9.0)
    h_cam = rng.uniform(1.0, 1.5)              # camera height over floor, m

    depth = np.full((H, W), d_wall, np.float32)
    floor = np.broadcast_to(yy > y_h + 1.0, (H, W))
    d_floor = FOCAL * h_cam / np.maximum(yy - y_h, 1e-3)
    depth = np.where(floor, np.minimum(d_floor, d_wall), depth)

    def checker(period, phase=0.0):
        p = max(2.0, float(period))
        return (((yy + phase) // (p / 2) + (xx + phase) // (p / 2)) % 2)

    # base colors: mid-grey walls/floor so brightness carries no depth signal
    rgb = np.zeros((H, W, 3), np.float32)
    wall_tex = checker(FOCAL * 0.12 / d_wall)
    rgb += np.broadcast_to((150 - 40 * wall_tex)[..., None], (H, W, 3))
    # per-row floor texture gradient: overwrite floor rows with a stripe
    # pattern whose period tracks the local depth (texture gradient cue)
    stripe = ((xx // np.maximum(FOCAL * 0.06 / np.clip(depth, 0.5, 10), 2))
              % 2)
    rgb = np.where(floor[..., None], 110 + 50 * stripe[..., None], rgb)

    # wall decals: color edges with no depth edge (distractors)
    for _ in range(rng.integers(2, 5)):
        w = int(rng.uniform(50, 160)); h = int(rng.uniform(40, 120))
        x0 = int(rng.uniform(0, W - w)); y0 = int(rng.uniform(0, max(1, y_h - h)))
        rgb[y0:y0 + h, x0:x0 + w] = rng.uniform(40, 220, 3)

    # upright boxes of fixed world size, far to near (correct occlusion)
    ds = np.sort(rng.uniform(1.4, min(5.5, d_wall - 0.5),
                             rng.integers(4, 9)))[::-1]
    for d in ds:
        w0, h0 = 0.45, rng.choice([0.5, 0.8, 1.1])   # world metres
        pw = int(FOCAL * w0 / d); ph = int(FOCAL * h0 / d)
        y_base = int(y_h + FOCAL * h_cam / d)
        x0 = int(rng.uniform(-pw // 3, W - pw + pw // 3))
        y0, y1 = max(0, y_base - ph), min(H, y_base)
        xa, xb = max(0, x0), min(W, x0 + pw)
        if y1 <= y0 or xb <= xa:
            continue
        depth[y0:y1, xa:xb] = d
        hue = rng.uniform(30, 225, 3)                # DISTRACTOR color
        tex = checker(FOCAL * 0.10 / d, phase=x0)[y0:y1, xa:xb]
        rgb[y0:y1, xa:xb] = hue * (0.75 + 0.25 * tex[..., None])

    rgb = rgb + rng.normal(0.0, 3.0, rgb.shape)
    return np.clip(depth, 0.7, 9.9), np.clip(rgb, 0, 255).astype(np.uint8)


def write_split(root: str, prefix: str, n: int, seed: int, lines: list,
                hard: bool = False):
    for i in range(n):
        rng = np.random.default_rng(np.random.SeedSequence([seed, i]))
        if hard:
            depth, rgb = make_scene_hard(rng)
        else:
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
    ap.add_argument("--hard", action="store_true",
                    help="multi-factor scenes (geometry + perspective size + "
                         "texture gradient; color is a distractor) — the "
                         "reference-difficulty convergence testbed")
    ap.add_argument("--name", default=None,
                    help="run name written into params.txt")
    args = ap.parse_args()

    root = os.path.abspath(args.out_root)
    train_lines, eval_lines = [], []
    write_split(os.path.join(root, "sync"), "", args.n_train, 100, train_lines,
                hard=args.hard)
    write_split(os.path.join(root, "eval"), "e", args.n_eval, 200, eval_lines,
                hard=args.hard)
    with open(os.path.join(root, "train_files.txt"), "w") as f:
        f.write("\n".join(train_lines) + "\n")
    with open(os.path.join(root, "eval_files.txt"), "w") as f:
        f.write("\n".join(eval_lines) + "\n")
    params = PARAMS_TEMPLATE.format(root=root, bs=args.bs,
                                    epochs=args.epochs,
                                    validate_every=args.validate_every)
    if args.name:
        params = params.replace("--name synth_convergence",
                                "--name " + args.name)
    with open(os.path.join(root, "params.txt"), "w") as f:
        f.write(params)
    print(f"wrote {args.n_train} train + {args.n_eval} eval images under {root}")
    print(f"params file: {os.path.join(root, 'params.txt')}")


if __name__ == "__main__":
    main()
