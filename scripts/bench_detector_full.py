#!/usr/bin/env python
"""Exercise the Swin-B Cascade Mask R-CNN at its real operating point on TPU
(VERDICT r1 item 6): compile + run `CascadeMaskRCNN.infer` at the ade20k test
shapes (configs/swin/cascade_mask_rcnn_swin_base ade20k: keep-ratio (1333,800),
pad /32 — 800x1088 for NYU 480x640 frames, 800x1344 worst case), through
paste_masks/collapse_detections to the .npz artifact, and report images/sec.

Synthetic weights + images: this proves the full-scale program compiles, fits
and runs at speed; accuracy parity additionally needs a released checkpoint.

Usage: python scripts/bench_detector_full.py [--shape 800x1344] [--iters 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="800x1088",
                    help="padded HxW (ade20k NYU operating point 800x1088; "
                         "max 800x1344)")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--out", default="/tmp/detector_full_scale.npz")
    ap.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    args = ap.parse_args()
    ph, pw = (int(v) for v in args.shape.split("x"))
    # valid (unpadded) extent: NYU 480x640 -> 800x1067 in a 800x1088 pad;
    # ade20k worst case 800x1333 in 800x1344
    th, tw = ph, {1088: 1067, 1344: 1333}.get(pw, pw)

    import functools

    import jax
    import jax.numpy as jnp
    from mde_tpu.offline.cascade_rcnn import (CascadeMaskRCNN, collapse_detections,
                                              paste_masks)

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = CascadeMaskRCNN(dtype=dtype)
    rng = np.random.default_rng(0)
    print(f"init at {ph}x{pw} ...", flush=True)
    t0 = time.time()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), dtype))
    print(f"init done in {time.time() - t0:.1f}s", flush=True)

    @functools.partial(jax.jit, static_argnums=(2,))
    def infer(variables, x, img_hw):
        return model.apply(variables, x, img_hw, method=CascadeMaskRCNN.infer)

    x = jnp.asarray(rng.standard_normal((1, ph, pw, 3)).astype(np.float32),
                    dtype=dtype)
    print("compiling full-scale infer ...", flush=True)
    t0 = time.time()
    det = jax.block_until_ready(infer(variables, x, (th, tw)))
    print(f"first call (compile + run): {time.time() - t0:.1f}s", flush=True)

    # All iters inside one lax.scan dispatch (input chained on each det's
    # scores) + closing scalar fetch: excludes per-call tunnel RTT and
    # early-returning block_until_ready (CLAUDE.md).
    @functools.partial(jax.jit, static_argnums=(2, 3))
    def infer_n(variables, x0, img_hw, n):
        def body(carry, _):
            d = model.apply(variables, carry, img_hw,
                            method=CascadeMaskRCNN.infer)
            # 1e-30 (not 0x) so XLA's algebraic simplifier cannot fold the
            # dependence away and hoist the loop-invariant body out of scan
            carry = carry + (jnp.sum(d["scores"]) * 1e-30).astype(carry.dtype)
            return carry, d["scores"][0]
        _, top = jax.lax.scan(body, x0, None, length=n)
        return top

    print("compiling scanned timing loop ...", flush=True)
    top = infer_n(variables, x, (th, tw), args.iters)
    _ = float(top[-1])
    t0 = time.time()
    top = infer_n(variables, x, (th, tw), args.iters)
    _ = float(top[-1])
    dt = (time.time() - t0) / args.iters
    ips = 1.0 / dt

    det_np = {k: np.asarray(v) for k, v in det.items()}
    masks_full = paste_masks(det_np, th, tw)
    labels_map, areas_map = collapse_detections(det_np, masks_full, th, tw)
    np.savez_compressed(args.out, instance_labels=labels_map.astype(np.int32),
                        instance_areas=areas_map.astype(np.int32))
    print(json.dumps({"metric": "detector_infer_images_per_sec", "value": ips,
                      "unit": "img/s", "shape": args.shape,
                      "dtype": args.dtype, "artifact": args.out}))


if __name__ == "__main__":
    main()
