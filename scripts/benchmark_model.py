#!/usr/bin/env python
"""Model benchmark + FLOPs counter + profiler trace — the TPU-native
equivalent of the Swin fork's tools/analysis_tools/{benchmark.py,get_flops.py}.

Measures steady-state forward / train-step throughput for any model config,
reports XLA's own FLOP estimate, and optionally captures a jax.profiler trace
viewable in TensorBoard/Perfetto.

Usage:
  python scripts/benchmark_model.py --encoder efficientnet-b1 --n-bins 256
  python scripts/benchmark_model.py --mode train --trace /tmp/trace
  python scripts/benchmark_model.py --height 480 --width 640 --batch 8
"""

import argparse
import os
import sys
import time
import types

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--encoder", default="efficientnet-b1")
    ap.add_argument("--n-bins", type=int, default=256)
    ap.add_argument("--height", type=int, default=416)
    ap.add_argument("--width", type=int, default=544)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--mode", choices=["forward", "train"], default="forward")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--trace", default=None, help="dir for a jax.profiler trace")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from mde_tpu.models import build_model
    from mde_tpu.train.loop import make_train_step
    from mde_tpu.train.state import create_train_state
    from mde_tpu.parallel import make_mesh

    margs = types.SimpleNamespace(
        n_bins=args.n_bins, min_depth=1e-3, max_depth=10.0, norm="linear",
        encoder_name=args.encoder, use_semantics=None,
        use_instance_segmentation=None, insertion_point="before-attn",
        image="rgb", w_chamfer=0.1, chamfer=True, epochs=25, lr=3.57e-4,
        wd=0.1, div_factor=25.0, final_div_factor=100.0, same_lr=False, seed=0)

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = build_model(margs, dtype=dtype)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal(
        (args.batch, args.height, args.width, 3), dtype=np.float32))

    if args.mode == "forward":
        variables = model.init({"params": jax.random.PRNGKey(0)}, img)

        @jax.jit
        def step(v, x):
            return model.apply(v, x, train=False)

        lowered = step.lower(variables, img)
        compiled = lowered.compile()
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = (cost or {}).get("flops", float("nan"))

        # scalar fetch, not block_until_ready — the tunnel can return early
        # (CLAUDE.md); the readback bounds real device time
        run = lambda: float(step(variables, img)[1][0, 0, 0, 0])
    else:
        depth = jnp.asarray(rng.random(
            (args.batch, args.height, args.width, 1), dtype=np.float32) * 9.9 + 0.05)
        mesh = make_mesh()
        state = create_train_state(model, margs, jax.random.PRNGKey(0), (img,),
                                   steps_per_epoch=1000)
        train_step = make_train_step(model, margs, None, None, mesh)
        batch = {"image": img, "depth": depth}
        key = jax.random.PRNGKey(1)
        flops = float("nan")

        def run():
            nonlocal state
            state, metrics = train_step(state, batch, key)
            _ = float(metrics["loss"])  # fetch: see CLAUDE.md tunnel notes

    for _ in range(args.warmup):
        run()

    if args.trace:
        with jax.profiler.trace(args.trace):
            run()
        print(f"trace written to {args.trace}")

    t0 = time.perf_counter()
    for _ in range(args.iters):
        run()
    dt = time.perf_counter() - t0

    ips = args.batch * args.iters / dt
    print(f"mode={args.mode} {args.encoder} bs={args.batch} "
          f"{args.height}x{args.width} {args.dtype}")
    print(f"throughput: {ips:.2f} images/sec ({dt / args.iters * 1000:.2f} ms/step)")
    if flops == flops:  # not NaN
        print(f"XLA flops/step: {flops / 1e9:.2f} GFLOPs "
              f"({flops * args.iters / dt / 1e12:.2f} TFLOP/s achieved)")


if __name__ == "__main__":
    main()
