#!/usr/bin/env python
"""Generate a synthetic-but-learnable KITTI-format depth dataset on disk.

VERDICT r4 next #6: kb_crop / use_right / depth-png-div-256 / garg-crop had
only composed in unit tests (tests/test_kitti.py); this builds a real
on-disk KITTI eigen-style tree so the full CLI chain (`python train.py` ->
`python evaluate.py --save_dir`) can execute end-to-end in KITTI mode.

Format (reference dataloader.py:98-174 kitti branches):
  OUT/2011_09_26_drive_{k:04d}/image_02/{i:010d}.jpg   left rgb 375x1242
  OUT/2011_09_26_drive_{k:04d}/image_03/{i:010d}.jpg   right rgb (shifted)
  OUT/2011_09_26_drive_{k:04d}/proj_depth/{i:010d}.png uint16 depth*256
  split lines: left gt focal right gt_right   (train, use_right capable)
               left gt focal                  (eval)
Depth is the same smooth colormap-invertible function as the NYU generator,
scaled into KITTI's 2..70 m range, with a sparse validity mask (~30% of
pixels dropped to 0) to exercise the >0 GT masking like real LiDAR maps.

Usage: python scripts/make_synthetic_kitti.py OUT_ROOT [--n-train 128]
"""

import argparse
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(__file__))
from make_synthetic_nyu import make_scene, depth_to_rgb  # noqa: E402

H, W = 375, 1242
FOCAL = 721.5377


def kitti_scene(rng):
    """NYU-generator scene stretched to KITTI geometry + range."""
    d_nyu = make_scene(rng)                       # 1..9.9 m at 480x640
    # resize to KITTI frame (nearest is fine for synthetic content)
    yi = (np.arange(H) * (d_nyu.shape[0] / H)).astype(int)
    xi = (np.arange(W) * (d_nyu.shape[1] / W)).astype(int)
    d = d_nyu[yi][:, xi]
    d = 2.0 + (d - 1.0) * (68.0 / 8.9)            # 2..70 m
    rgb = depth_to_rgb((d - 2.0) / (68.0 / 8.9) + 1.0, rng)  # same colormap
    return d, rgb


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_root")
    ap.add_argument("--n-train", type=int, default=128)
    ap.add_argument("--n-eval", type=int, default=8)
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=25)
    ap.add_argument("--validate-every", type=int, default=100)
    args = ap.parse_args()
    root = os.path.abspath(args.out_root)

    def write(n, seed, drive0, lines, eval_mode=False):
        for i in range(n):
            rng = np.random.default_rng(np.random.SeedSequence([seed, i]))
            depth, rgb = kitti_scene(rng)
            drive = f"2011_09_26_drive_{drive0 + i // 32:04d}"
            d = os.path.join(root, drive)
            for sub in ("image_02", "image_03", "proj_depth"):
                os.makedirs(os.path.join(d, sub), exist_ok=True)
            Image.fromarray(rgb).save(
                os.path.join(d, "image_02", f"{i:010d}.jpg"), quality=95)
            # right image: left shifted by a small disparity (content parity
            # is irrelevant; the loader just needs a decodable frame)
            Image.fromarray(np.roll(rgb, -8, axis=1)).save(
                os.path.join(d, "image_03", f"{i:010d}.jpg"), quality=95)
            valid = rng.random(depth.shape) > 0.3   # sparse like LiDAR
            d16 = np.where(valid, depth * 256.0, 0.0).astype(np.uint16)
            Image.fromarray(d16).save(
                os.path.join(d, "proj_depth", f"{i:010d}.png"))
            rel = f"/{drive}"
            if eval_mode:
                lines.append(f"{rel}/image_02/{i:010d}.jpg "
                             f"{rel}/proj_depth/{i:010d}.png {FOCAL}")
            else:
                lines.append(f"{rel}/image_02/{i:010d}.jpg "
                             f"{rel}/proj_depth/{i:010d}.png {FOCAL} "
                             f"{rel}/image_03/{i:010d}.jpg "
                             f"{rel}/proj_depth/{i:010d}.png")

    train_lines, eval_lines = [], []
    write(args.n_train, 300, 0, train_lines)
    write(args.n_eval, 400, 90, eval_lines, eval_mode=True)
    with open(os.path.join(root, "train_files.txt"), "w") as f:
        f.write("\n".join(train_lines) + "\n")
    with open(os.path.join(root, "eval_files.txt"), "w") as f:
        f.write("\n".join(eval_lines) + "\n")

    params = f"""--bs {args.bs}
--dataset kitti
--lr 0.000357
--wd 0.1
--div_factor 25
--final_div_factor 100
--epochs {args.epochs}
--workers 4
--name synth_kitti
--n_bins 256
--norm linear
--w_chamfer 0.1
--root {root}/runs
--data_path {root}/
--gt_path {root}/
--filenames_file {root}/train_files.txt
--input_height 352
--input_width 704
--min_depth 0.001
--max_depth 80
--do_random_rotate
--degree 1.0
--do_kb_crop
--use_right
--validate_every {args.validate_every}
--data_path_eval {root}/
--gt_path_eval {root}/
--filenames_file_eval {root}/eval_files.txt
--min_depth_eval 1e-3
--max_depth_eval 80
--garg_crop
--encoder_name efficientnet-b1
"""
    with open(os.path.join(root, "params.txt"), "w") as f:
        f.write(params)
    # evaluate.py takes an EvalArgParser file (reference args_test_nyu.txt
    # surface); train-only flags would be unknown args there
    params_eval = f"""--dataset kitti
--data_path {root}/
--gt_path {root}/
--filenames_file {root}/eval_files.txt
--input_height 352
--input_width 704
--min_depth 0.001
--max_depth 80
--data_path_eval {root}/
--gt_path_eval {root}/
--filenames_file_eval {root}/eval_files.txt
--min_depth_eval 1e-3
--max_depth_eval 80
--garg_crop
--do_kb_crop
--encoder_name efficientnet-b1
"""
    with open(os.path.join(root, "params_eval.txt"), "w") as f:
        f.write(params_eval)
    print(f"wrote {args.n_train} train + {args.n_eval} eval KITTI frames under {root}")


if __name__ == "__main__":
    main()
