#!/usr/bin/env python
"""Standalone semantic-segmentation evaluation: mIoU + pixel accuracy over an
ADE20K-style validation list (the reference's
semantic-segmentation-pytorch/eval_multipro.py capability, single-host; the
multi-GPU worker fan-out there is replaced by one jitted multi-scale forward).

Input list is odgt (json-lines: {"fpath_img": ..., "fpath_segm": ...}), the
format mit_semseg's ValDataset consumes; annotation pngs hold class ids 1..150
with 0 = unlabeled (converted to ignore=-1, mit_semseg/dataset.py segm - 1).

Usage:
  python scripts/eval_semseg.py --odgt validation.odgt --root ADEChallengeData2016 \
      --encoder-ckpt encoder_epoch_30.pth --decoder-ckpt decoder_epoch_30.pth
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--odgt", required=True, help="validation odgt list")
    ap.add_argument("--root", default="", help="prefix for the odgt paths")
    ap.add_argument("--encoder-ckpt", required=True)
    ap.add_argument("--decoder-ckpt", required=True)
    ap.add_argument("--num-classes", type=int, default=150)
    ap.add_argument("--max-images", type=int, default=None)
    ap.add_argument("--result-dir", default=None,
                    help="if set, save img|gt|pred grids like VAL.visualize")
    args = ap.parse_args()

    import functools

    import jax
    import jax.numpy as jnp
    from PIL import Image
    from mde_tpu.offline.hrnet import HRNetV2C1, hrnet_multiscale_inference
    from mde_tpu.offline.hrnet_convert import convert_hrnet_c1
    from mde_tpu.ops.metrics import intersection_and_union

    params, stats = convert_hrnet_c1(args.encoder_ckpt, args.decoder_ckpt)
    variables = {"params": jax.tree_util.tree_map(jnp.asarray, params),
                 "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)}
    model = HRNetV2C1(dtype=jnp.bfloat16)

    @functools.partial(jax.jit, static_argnums=(2,))
    def apply_fn(variables, x, seg_size):
        return model.apply(variables, x, seg_size=seg_size, train=False)

    samples = [json.loads(l) for l in open(args.odgt)]
    if args.max_images:
        samples = samples[:args.max_images]

    inter_sum = np.zeros(args.num_classes, np.float64)
    union_sum = np.zeros(args.num_classes, np.float64)
    acc_sum = pix_sum = 0.0
    for i, s in enumerate(samples):
        img = np.asarray(Image.open(os.path.join(args.root, s["fpath_img"]))
                         .convert("RGB"), dtype=np.float32) / 255.0
        segm = np.asarray(Image.open(os.path.join(args.root, s["fpath_segm"])),
                          dtype=np.int64) - 1  # 0 (unlabeled) -> -1 ignore
        pred = hrnet_multiscale_inference(
            lambda v, x, hw: apply_fn(v, x, tuple(hw)), variables, img)

        valid = segm >= 0
        acc_sum += float(np.sum((pred == segm) & valid))
        pix_sum += float(np.sum(valid))
        inter, union = intersection_and_union(pred, segm, args.num_classes)
        inter_sum += inter
        union_sum += union

        if args.result_dir:
            from mde_tpu.utils.graphs import color_encode, load_color150
            os.makedirs(args.result_dir, exist_ok=True)
            colors = load_color150()
            vis = np.concatenate([(img * 255).astype(np.uint8),
                                  color_encode(segm, colors),
                                  color_encode(pred, colors)], axis=1)
            Image.fromarray(vis).save(os.path.join(
                args.result_dir,
                os.path.basename(s["fpath_img"]).replace(".jpg", ".png")))
        if i % 20 == 0:
            miou_sofar = np.mean(inter_sum[union_sum > 0] / union_sum[union_sum > 0]) \
                if np.any(union_sum > 0) else float("nan")
            print(f"[{i}/{len(samples)}] running mIoU {miou_sofar:.4f} "
                  f"acc {acc_sum / max(pix_sum, 1):.4f}")

    iou = np.full(args.num_classes, np.nan)
    seen = union_sum > 0
    iou[seen] = inter_sum[seen] / union_sum[seen]
    for c in range(args.num_classes):
        print(f"class [{c}], IoU: {iou[c]:.4f}")
    print(f"[Eval Summary]:")
    print(f"Mean IoU: {np.nanmean(iou):.4f}, "
          f"Accuracy: {100.0 * acc_sum / max(pix_sum, 1):.2f}%")


if __name__ == "__main__":
    main()
