#!/usr/bin/env python
"""Train the Swin-B Cascade Mask R-CNN on COCO-format instance annotations —
the capability of the reference's Swin…/tools/train.py with the ade20k config
(AdamW 1e-4 wd .05 paramwise, step decay 27/33 of 36 epochs, DETR-style
AutoAugment; reference configs/swin/cascade_…ade20k.py:125-141).

Shapes vary per AutoAugment scale; each padded size compiles once (the /32
pad keeps the set small). Checkpoints are orbax trees compatible with
scripts/generate_instances.py.

Usage:
  python scripts/train_detector.py --images ade20k/images --annotations inst_train.json \
      --num-classes 100 [--pretrained swin_ckpt.pth] [--epochs 36] [--out runs/det]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True)
    ap.add_argument("--annotations", required=True)
    ap.add_argument("--num-classes", type=int, default=100)
    ap.add_argument("--pretrained", default=None,
                    help="mmdet/Swin .pth to warm-start from")
    ap.add_argument("--epochs", type=int, default=36)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--wd", type=float, default=0.05)
    ap.add_argument("--out", default="./runs/detector")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--log-every", type=int, default=20)
    ap.add_argument("--save-every", type=int, default=2000)
    ap.add_argument("--max-steps", type=int, default=0,
                    help="stop after N optimizer steps (0 = run all epochs); "
                         "smoke runs and budgeted jobs")
    ap.add_argument("--max-gt", type=int, default=100,
                    help="static GT padding capacity per image")
    ap.add_argument("--fixed-scale", default=None, metavar="SHORT,LONG",
                    help="pin the AutoAugment scale set to one (short,long) "
                         "pair (reduced-scale runs on small synthetic sets; "
                         "one compiled program instead of the full scale set)")
    args = ap.parse_args()

    if args.fixed_scale:
        import mde_tpu.offline.detection_data as dd
        short, long_ = (int(v) for v in args.fixed_scale.split(","))
        dd.SCALES_MAIN = [(short, long_)]
        dd.SCALES_PRE_CROP = [(short, long_)]
        dd.CROP_RANGE = (short, short)

    import jax
    import jax.numpy as jnp
    import optax
    from mde_tpu.offline.cascade_rcnn import CascadeMaskRCNN
    from mde_tpu.offline.coco_dataset import CocoInstanceDataset
    from mde_tpu.offline.detection_data import detector_optimizer
    from mde_tpu.checkpoint import save_checkpoint
    from mde_tpu.train.state import TrainState

    ds = CocoInstanceDataset(args.images, args.annotations)
    print(f"{len(ds)} annotated images")
    steps_per_epoch = len(ds)

    # use_checkpoint=True matches the reference detector config
    # (cascade_mask_rcnn_swin_base ade20k) and is what makes 1333x800
    # training fit in HBM
    model = CascadeMaskRCNN(num_classes=args.num_classes, dtype=jnp.bfloat16,
                            use_checkpoint=True)
    rng = np.random.default_rng(args.seed)
    sample = ds.train_sample(rng, 0, max_gt=args.max_gt)
    variables = model.init({"params": jax.random.PRNGKey(args.seed)},
                           jnp.asarray(sample["image"][None]))
    params, batch_stats = variables["params"], variables.get("batch_stats", {})

    if args.pretrained:
        from mde_tpu.offline.swin_convert import convert_detector
        try:
            loaded, loaded_stats = convert_detector(args.pretrained)
            params = jax.tree_util.tree_map(jnp.asarray, loaded)
            for k, v in loaded_stats.items():
                batch_stats[k] = jax.tree_util.tree_map(jnp.asarray, v)
            print(f"warm-started from {args.pretrained}")
        except KeyError as e:
            print(f"partial checkpoint ({e}); keeping random init for missing parts")

    tx = detector_optimizer(params, base_lr=args.lr, weight_decay=args.wd,
                            steps_per_epoch=steps_per_epoch, epochs=args.epochs)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx,
                              batch_stats=batch_stats)

    @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(2,))
    def train_step(state, batch, valid_hw, key):
        def loss_fn(p, s):
            losses, mut = model.apply(
                {"params": p, "batch_stats": s}, batch["image"][None],
                batch["gt_boxes"], batch["gt_labels"], batch["gt_valid"],
                batch["gt_masks"], key, valid_hw,
                method=CascadeMaskRCNN.compute_losses, mutable=["batch_stats"])
            return losses["total"], (losses, mut.get("batch_stats", s))

        (loss, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats)
        state = state.apply_gradients(grads=grads)
        return state.replace(batch_stats=new_stats), losses

    os.makedirs(args.out, exist_ok=True)
    key = jax.random.PRNGKey(args.seed + 1)
    step = 0
    t0 = time.time()
    done = False
    for epoch in range(args.epochs):
        order = rng.permutation(len(ds))
        for idx in order:
            sample = ds.train_sample(rng, int(idx), max_gt=args.max_gt)
            batch = {k: jnp.asarray(v) for k, v in sample.items() if k != "valid_hw"}
            state, losses = train_step(state, batch, tuple(sample["valid_hw"]),
                                       jax.random.fold_in(key, step))
            step += 1
            if step % args.log_every == 0:
                print(f"e{epoch} s{step}: total {float(losses['total']):.4f} "
                      f"rpn {float(losses['rpn_cls']):.3f}/{float(losses['rpn_reg']):.3f} "
                      f"({step / (time.time() - t0):.2f} it/s)")
            if step % args.save_every == 0:
                save_checkpoint(state, epoch, f"detector_step{step}", root=args.out)
            if args.max_steps and step >= args.max_steps:
                done = True
                break
        save_checkpoint(state, epoch, "detector_latest", root=args.out)
        if done:
            break
    print("done")


if __name__ == "__main__":
    main()
