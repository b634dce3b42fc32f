#!/usr/bin/env python
"""Generate instance cue maps over an NYUD2 tree — the reference's
Swin-Transformer-Object-Detection/tools/nyud2_inference.py:62-139 as a JAX
pipeline: for every rgb_*.jpg, run Swin-B Cascade Mask R-CNN, collapse
per-instance masks into one int32 label map (background -1) and a per-pixel
area map (mask-sum or bbox area), and save compressed
instance_{labels,areas}_ade20k_swin[_bbox]_*.npz next to the image. Also
accumulates the per-class (area, depth-mean, depth-std) statistics the
reference collects for its area/depth analysis.

Test pipeline per the ade20k config (configs/_base_/datasets/ade20k_instance.py):
keep-ratio resize to (1333, 800), mmdet ImageNet normalization, pad to /32.

Usage:
  python scripts/generate_instances.py --images data/nyu/sync \
      --checkpoint cascade_mask_rcnn_swin_base_ade20k.pth [--bbox-areas]
"""

import argparse
import glob
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

MEAN = np.array([123.675, 116.28, 103.53], np.float32)
STD = np.array([58.395, 57.12, 57.375], np.float32)
MAX_LONG, MAX_SHORT = 1333, 800


def preprocess(img_u8: np.ndarray):
    """Keep-ratio resize + normalize + pad to /32. Returns (padded, scale,
    resized_hw)."""
    from PIL import Image
    h, w = img_u8.shape[:2]
    scale = min(MAX_LONG / max(h, w), MAX_SHORT / min(h, w))
    th, tw = int(h * scale + 0.5), int(w * scale + 0.5)
    resized = np.asarray(Image.fromarray(img_u8).resize((tw, th), Image.BILINEAR),
                         dtype=np.float32)
    x = (resized - MEAN) / STD
    ph = ((th + 31) // 32) * 32
    pw = ((tw + 31) // 32) * 32
    out = np.zeros((ph, pw, 3), np.float32)
    out[:th, :tw] = x
    return out, (tw / w, th / h), (th, tw)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--random-init", type=int, default=None, metavar="SEED",
                    help="skip checkpoint conversion and run with flax-"
                         "initialized weights (system tests of the offline->"
                         "side-file->cue-training loop)")
    ap.add_argument("--bbox-areas", action="store_true",
                    help="use bbox area instead of mask area (the _bbox variant)")
    ap.add_argument("--classes", choices=["ade20k", "coco"], default="ade20k",
                    help="output convention: ade20k -> instance_*_ade20k_swin*.npz "
                         "(labels 0..99, bg -1); coco -> instance_*_coco.npy "
                         "(matterport ordering: bg 0, classes 1..80). NOTE: the "
                         "reference's coco script paints ROI indices instead of "
                         "class ids (misc_scripts/maskrcnn_inference_nyud2.py:196); "
                         "we paint class ids.")
    ap.add_argument("--num-classes", type=int, default=None,
                    help="detector head classes (default 100 ade20k / 80 coco)")
    ap.add_argument("--depths", default=None,
                    help="optional dir of sync_depth pngs for the area/depth stats")
    ap.add_argument("--stats-out", default=None)
    ap.add_argument("--overwrite", action="store_true")
    ap.add_argument("--score-thr", type=float, default=0.05,
                    help="test_cfg.rcnn score threshold (lower for "
                         "random-init system runs: an untrained softmax "
                         "sits near 1/(C+1))")
    args = ap.parse_args()

    import functools
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from mde_tpu.offline.cascade_rcnn import (CascadeMaskRCNN, collapse_detections,
                                              paste_masks)
    from mde_tpu.offline.swin_convert import convert_detector

    coco = args.classes == "coco"
    num_classes = args.num_classes or (80 if coco else 100)
    model = CascadeMaskRCNN(num_classes=num_classes, dtype=jnp.bfloat16,
                            score_thr=args.score_thr)
    if args.random_init is not None:
        # 128x128 keeps every FPN level (down to /64) non-degenerate at
        # init; jitted — eager init dispatches per-op over the tunnel
        dummy = jnp.zeros((1, 128, 128, 3), jnp.float32)
        variables = jax.jit(lambda r, x: model.init(
            {"params": r}, x, (128, 128), method=CascadeMaskRCNN.infer))(
                jax.random.PRNGKey(args.random_init), dummy)
    else:
        if not args.checkpoint:
            ap.error("--checkpoint required unless --random-init")
        params, stats = convert_detector(args.checkpoint)
        variables = {"params": jax.tree_util.tree_map(jnp.asarray, params),
                     "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)}

    @functools.partial(jax.jit, static_argnums=(2,))
    def infer(variables, x, img_hw):
        return model.apply(variables, x, img_hw, method=CascadeMaskRCNN.infer)

    if coco:
        tag, ext = "coco", ".npy"
    else:
        tag = "ade20k_swin_bbox" if args.bbox_areas else "ade20k_swin"
        ext = ".npz"
    files = sorted(glob.glob(os.path.join(args.images, "**", "rgb_*.jpg"),
                             recursive=True))
    print(f"{len(files)} images")
    area_depth_std_points = [[] for _ in range(num_classes + 1)]

    for n, f in enumerate(files):
        lab_path = f.replace("rgb", "instance_labels_" + tag).replace(".jpg", ext)
        area_path = f.replace("rgb", "instance_areas_" + tag).replace(".jpg", ext)
        if os.path.exists(lab_path) and os.path.exists(area_path) and not args.overwrite:
            continue
        img = np.asarray(Image.open(f).convert("RGB"))
        h, w = img.shape[:2]
        x, (sx, sy), (th, tw) = preprocess(img)
        det = infer(variables, jnp.asarray(x[None]), (th, tw))
        det = {k: np.asarray(v) for k, v in det.items()}
        # rescale boxes back to the original frame
        det["boxes"] = det["boxes"] / np.array([sx, sy, sx, sy], np.float32)
        masks_full = paste_masks(det, h, w)
        if coco:
            # matterport convention: bg 0, classes shifted to 1..num_classes
            det_shift = dict(det, labels=det["labels"] + 1)
            labels_map, areas_map = collapse_detections(det_shift, masks_full, h, w,
                                                        use_bbox_area=args.bbox_areas)
            labels_map = np.where(labels_map < 0, 0, labels_map)
        else:
            labels_map, areas_map = collapse_detections(det, masks_full, h, w,
                                                        use_bbox_area=args.bbox_areas)

        if coco:
            np.save(lab_path, labels_map)
            np.save(area_path, areas_map)
        elif not det["valid"].any():
            # reference writes object-None npz when nothing is detected
            np.savez_compressed(lab_path, np.array(None, dtype=object))
            np.savez_compressed(area_path, np.array(None, dtype=object))
        else:
            np.savez_compressed(lab_path, labels_map)
            np.savez_compressed(area_path, areas_map)

        if args.depths:
            dpath = f.replace("rgb", "sync_depth").replace(".jpg", ".png")
            if os.path.exists(dpath):
                depth = np.asarray(Image.open(dpath), np.float32) / 1000.0
                for i in np.flatnonzero(det["valid"]):
                    m = masks_full[i]
                    if m.any():
                        area = int(m.sum())
                        area_depth_std_points[int(det["labels"][i])].append(
                            [area, float(depth[m].mean()), float(depth[m].std())])

        if n % 25 == 0:
            print(f"{n}/{len(files)}")

    if args.stats_out:
        with open(args.stats_out, "wb") as fh:
            pickle.dump(area_depth_std_points, fh)
        print(f"wrote stats -> {args.stats_out}")


if __name__ == "__main__":
    main()
