#!/usr/bin/env python
"""Evaluate the Swin-B Cascade Mask R-CNN on a COCO-format val set — the
capability of the Swin fork's tools/test.py (`--eval bbox segm`): run
inference over every annotated image and report box/segm mAP@[.5:.95].

Usage:
  python scripts/eval_detector.py --images val/images --annotations inst_val.json \
      --checkpoint epoch_36.pth [--num-classes 100] [--max-images N]
"""

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True)
    ap.add_argument("--annotations", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--num-classes", type=int, default=100)
    ap.add_argument("--max-images", type=int, default=None)
    ap.add_argument("--score-thr", type=float, default=0.05)
    ap.add_argument("--max-long", type=int, default=None,
                    help="override the 1333 keep-ratio long side (reduced-"
                         "scale synthetic runs)")
    ap.add_argument("--max-short", type=int, default=None,
                    help="override the 800 keep-ratio short side")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from mde_tpu.offline.cascade_rcnn import CascadeMaskRCNN, paste_masks
    from mde_tpu.offline.coco_dataset import CocoInstanceDataset
    from mde_tpu.offline.detection_eval import DetectionEvaluator
    from mde_tpu.offline.swin_convert import convert_detector

    sys.path.insert(0, os.path.dirname(__file__))
    import generate_instances as gi
    from generate_instances import preprocess
    if args.max_long:
        gi.MAX_LONG = args.max_long
    if args.max_short:
        gi.MAX_SHORT = args.max_short

    if os.path.isdir(args.checkpoint):
        # orbax tree from scripts/train_detector.py (train->eval composition)
        from mde_tpu.checkpoint import load_checkpoint
        restored, _ = load_checkpoint(args.checkpoint)
        params = restored["params"]
        stats = restored.get("batch_stats", {})
    else:
        params, stats = convert_detector(args.checkpoint)
    variables = {"params": jax.tree_util.tree_map(jnp.asarray, params),
                 "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)}
    model = CascadeMaskRCNN(num_classes=args.num_classes, dtype=jnp.bfloat16)

    @functools.partial(jax.jit, static_argnums=(2,))
    def infer(variables, x, img_hw):
        return model.apply(variables, x, img_hw, method=CascadeMaskRCNN.infer)

    ds = CocoInstanceDataset(args.images, args.annotations)
    n = len(ds) if args.max_images is None else min(len(ds), args.max_images)
    print(f"evaluating {n} images")

    ev = DetectionEvaluator(args.num_classes, with_masks=True)
    for i in range(n):
        img, gt_boxes, gt_labels, gt_masks = ds[i]
        h, w = img.shape[:2]
        x, (sx, sy), (th, tw) = preprocess(img)
        det = infer(variables, jnp.asarray(x[None]), (th, tw))
        det = {k: np.asarray(v) for k, v in det.items()}
        det["boxes"] = det["boxes"] / np.array([sx, sy, sx, sy], np.float32)
        keep = det["valid"] & (det["scores"] > args.score_thr)
        masks_full = paste_masks(det, h, w)
        ev.add_image(
            {"boxes": det["boxes"][keep], "scores": det["scores"][keep],
             "labels": det["labels"][keep], "masks": masks_full[keep]},
            {"boxes": gt_boxes, "labels": gt_labels, "masks": gt_masks})
        if i % 25 == 0:
            print(f"{i}/{n}")

    for k, v in ev.summarize().items():
        print(f"{k}: {v:.4f}")


if __name__ == "__main__":
    main()
