#!/usr/bin/env python
"""Compile + step the Swin-B Cascade Mask R-CNN *trainer* at the real ade20k
operating point (VERDICT r2 next #4): 800x1088 padded input, bs1,
use_checkpoint=True, bf16 — the shape scripts/bench_detector_full.py already
ran for *inference* (7.25 img/s). Synthetic GT (static G boxes + full-res
masks) exercises the full loss stack: RPN losses over all FPN levels, 3
cascade stages with IoU assign/sample, GIoU + CE, mask roi_align targets.

Timing: ITERS steps inside one lax.scan dispatch closed by a scalar fetch,
with a chained-matmul tunnel-health stamp (CLAUDE.md methodology). A
remote-compile-helper HTTP 500 is recorded as the triangulation datapoint,
not a crash.

Usage: python scripts/probe_detector_train.py [H W [G]]   (default 800 1088 16)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = int(os.environ.get("PROBE_ITERS", "5"))


def tunnel_health():
    x = jnp.ones((4096, 4096), jnp.bfloat16)

    @jax.jit
    def chain(a):
        def body(c, _):
            return (c @ x) * 0 + x + 1e-30 * c, ()
        return jax.lax.scan(body, a, None, length=50)[0]

    _ = np.asarray(chain(x)[0, 0])
    t0 = time.perf_counter()
    _ = np.asarray(chain(x)[0, 0])
    return round(50 * 2 * 4096**3 / (time.perf_counter() - t0) / 1e12, 1)


def main():
    import functools

    from mde_tpu.offline.cascade_rcnn import CascadeMaskRCNN
    from mde_tpu.train.state import TrainState
    from mde_tpu.offline.detection_data import detector_optimizer

    h = int(sys.argv[1]) if len(sys.argv) > 1 else 800
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1088
    g = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    print(json.dumps({"devices": [str(d) for d in jax.devices()],
                      "tunnel_tflops_pre": tunnel_health(),
                      "shape": [h, w], "gt": g, "iters": ITERS}), flush=True)

    model = CascadeMaskRCNN(num_classes=100, dtype=jnp.bfloat16,
                            use_checkpoint=True)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((1, h, w, 3), dtype=np.float32))

    t0 = time.perf_counter()
    variables = model.init({"params": jax.random.PRNGKey(0)}, img)
    print(json.dumps({"init_s": round(time.perf_counter() - t0, 1)}), flush=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    # synthetic GT: g valid boxes with matching full-res soft masks
    x1 = rng.uniform(0, w * 0.7, g).astype(np.float32)
    y1 = rng.uniform(0, h * 0.7, g).astype(np.float32)
    bw = rng.uniform(32, 256, g).astype(np.float32)
    bh = rng.uniform(32, 256, g).astype(np.float32)
    gt_boxes = jnp.asarray(np.stack(
        [x1, y1, np.minimum(x1 + bw, w - 1), np.minimum(y1 + bh, h - 1)], 1))
    gt_labels = jnp.asarray(rng.integers(0, 100, g), jnp.int32)
    gt_valid = jnp.ones((g,), bool)
    masks = np.zeros((g, h, w), np.float32)
    for i in range(g):
        masks[i, int(y1[i]):int(y1[i] + bh[i]), int(x1[i]):int(x1[i] + bw[i])] = 1.0
    gt_masks = jnp.asarray(masks)

    tx = detector_optimizer(params, base_lr=1e-4, weight_decay=0.05,
                            steps_per_epoch=1000, epochs=36)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx,
                              batch_stats=batch_stats)

    def step_fn(state, key):
        def loss_fn(p, s):
            losses, mut = model.apply(
                {"params": p, "batch_stats": s}, img, gt_boxes, gt_labels,
                gt_valid, gt_masks, key, (h, w),
                method=CascadeMaskRCNN.compute_losses, mutable=["batch_stats"])
            return losses["total"], (losses, mut.get("batch_stats", s))

        (loss, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats)
        state = state.apply_gradients(grads=grads)
        return state.replace(batch_stats=new_stats), loss

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_steps(st, key):
        def body(s, i):
            s2, loss = step_fn(s, jax.random.fold_in(key, i))
            return s2, loss
        return jax.lax.scan(body, st, jnp.arange(ITERS))

    try:
        t0 = time.perf_counter()
        state, losses1 = run_steps(state, jax.random.PRNGKey(1))
        traj1 = [round(float(v), 4) for v in np.asarray(losses1)]
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        state, losses2 = run_steps(state, jax.random.PRNGKey(2))
        traj2 = [round(float(v), 4) for v in np.asarray(losses2)]
        dt = time.perf_counter() - t0
        print(json.dumps({
            "detector_train_ms_per_step": round(1e3 * dt / ITERS, 2),
            "img_per_sec": round(ITERS / dt, 2),
            "loss_trajectory": traj1 + traj2,
            "all_finite": bool(np.isfinite(traj1 + traj2).all()),
            "compile_s": round(compile_s, 1),
            "tunnel_tflops_post": tunnel_health()}), flush=True)
    except Exception as e:  # noqa: BLE001 — record helper-limit/OOM outcomes
        print(json.dumps({"error": f"{type(e).__name__}: {str(e)[:300]}"}),
              flush=True)


if __name__ == "__main__":
    main()
