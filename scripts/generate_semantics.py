#!/usr/bin/env python
"""Generate 150-class semantic cue maps over an NYUD2 tree
(the reference's demo_test.sh + semantic-segmentation-pytorch/test.py:30-101):
for every rgb_*.jpg under --images, write semantic_seg_*.npy next to it
containing the multi-scale-averaged HRNetV2-W48+C1 argmax map.

Usage:
  python scripts/generate_semantics.py --images data/nyu/sync \
      --encoder-ckpt encoder_epoch_30.pth --decoder-ckpt decoder_epoch_30.pth
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True, help="root dir scanned for rgb_*.jpg")
    ap.add_argument("--encoder-ckpt", default=None)
    ap.add_argument("--decoder-ckpt", default=None)
    ap.add_argument("--random-init", type=int, default=None, metavar="SEED",
                    help="skip checkpoint conversion and run with flax-"
                         "initialized weights (system tests of the offline->"
                         "side-file->cue-training loop where no released "
                         "checkpoint is available)")
    ap.add_argument("--overwrite", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image
    from mde_tpu.offline.hrnet import HRNetV2C1, hrnet_multiscale_inference

    model = HRNetV2C1(dtype=jnp.bfloat16)
    if args.random_init is not None:
        # param shapes are input-size independent; init small for speed.
        # jit the init: eager init dispatches per-op over the remote-compile
        # tunnel and stalls for minutes (CLAUDE.md per-op-RTT gotcha)
        dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = jax.jit(lambda r, x: model.init(
            {"params": r}, x, seg_size=(64, 64), train=False))(
                jax.random.PRNGKey(args.random_init), dummy)
    else:
        if not (args.encoder_ckpt and args.decoder_ckpt):
            ap.error("--encoder-ckpt/--decoder-ckpt required unless --random-init")
        from mde_tpu.offline.hrnet_convert import convert_hrnet_c1
        params, stats = convert_hrnet_c1(args.encoder_ckpt, args.decoder_ckpt)
        variables = {"params": jax.tree_util.tree_map(jnp.asarray, params),
                     "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)}

    import functools

    @functools.partial(jax.jit, static_argnums=(2,))
    def apply_fn(variables, x, seg_size):
        return model.apply(variables, x, seg_size=seg_size, train=False)

    files = sorted(glob.glob(os.path.join(args.images, "**", "rgb_*.jpg"),
                             recursive=True))
    print(f"{len(files)} images")
    for i, f in enumerate(files):
        out_path = f.replace("rgb", "semantic_seg").replace(".jpg", ".npy")
        if os.path.exists(out_path) and not args.overwrite:
            continue
        img = np.asarray(Image.open(f), dtype=np.float32) / 255.0
        seg = hrnet_multiscale_inference(
            lambda v, x, hw: apply_fn(v, x, tuple(hw)), variables, img)
        np.save(out_path, seg.astype(np.uint8))
        if i % 50 == 0:
            print(f"{i}/{len(files)} -> {out_path}")


if __name__ == "__main__":
    main()
