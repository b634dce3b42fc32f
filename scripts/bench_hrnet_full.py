#!/usr/bin/env python
"""Exercise the HRNetV2-W48 + C1 semantics pipeline at its real NYUD2
operating point on TPU: full multi-scale protocol (short side 300..600, max
1000, pad /32 — reference semantic-segmentation-pytorch config/ade20k-hrnetv2
.yaml:7-9, test.py:60-103) over a 480x640 frame, through score averaging and
argmax to the `semantic_seg_*.npy` artifact, and report frames/sec.

Synthetic weights + image: proves the full-scale program compiles, fits and
runs; accuracy additionally needs converted released checkpoints
(offline/hrnet_convert.py).

Timing: each frame is a Python loop over 5 scale forwards (distinct shapes),
so per-dispatch overhead is part of the real protocol; the closing np
readback per scale already forces completion (hrnet_multiscale_inference
fetches scores). We time full frames end-to-end.
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
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--out", default="/tmp/semantic_seg_full_scale.npy")
    ap.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    args = ap.parse_args()

    import functools

    import jax
    import jax.numpy as jnp
    from mde_tpu.offline.hrnet import HRNetV2C1, hrnet_multiscale_inference

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = HRNetV2C1(dtype=dtype)
    rng = np.random.default_rng(0)
    print("init ...", flush=True)
    t0 = time.time()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), dtype))
    print(f"init done in {time.time() - t0:.1f}s", flush=True)

    @functools.partial(jax.jit, static_argnums=(2,))
    def apply_fn(variables, x, seg_size):
        return model.apply(variables, x, seg_size=seg_size, train=False)

    img = rng.random((args.height, args.width, 3), dtype=np.float32)
    fn = lambda v, x, hw: apply_fn(v, x, tuple(hw))

    print("compiling 5 scale programs + first frame ...", flush=True)
    t0 = time.time()
    seg = hrnet_multiscale_inference(fn, variables, img)
    print(f"first frame (compile + run): {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    for _ in range(args.frames):
        seg = hrnet_multiscale_inference(fn, variables, img)
    dt = (time.time() - t0) / args.frames

    np.save(args.out, seg.astype(np.uint8))
    print(json.dumps({"metric": "hrnet_multiscale_frames_per_sec",
                      "value": 1.0 / dt, "unit": "frames/s",
                      "shape": f"{args.height}x{args.width}",
                      "scales": 5, "dtype": args.dtype,
                      "artifact": args.out}))


if __name__ == "__main__":
    main()
