#!/usr/bin/env python
"""Time the full eval step (forward + align-corners resize + clamp/scrub +
masked per-image metrics, train/loop.py::make_eval_step) at the NYU eval
operating point (480x640) on the real TPU. Scan-timed: all iterations inside
one dispatch, closed by a scalar fetch (CLAUDE.md tunnel notes)."""

import json
import os
import sys
import time
import types

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = int(os.environ.get("PROBE_ITERS", "10"))


def main():
    import functools

    from mde_tpu.models import build_model
    from mde_tpu.ops.metrics import eval_mask
    from mde_tpu.train.loop import make_eval_step

    bs = int(os.environ.get("PROBE_BS", "8"))
    h, w = 480, 640
    # PROBE_DTYPE=float32 measures the reference-parity eval default;
    # bfloat16 is the --compute_dtype serving opt-in. PROBE_HIRES=packed
    # adds the W-packed stage-0 layout to the serving config.
    cdt = jnp.float32 if os.environ.get("PROBE_DTYPE") == "float32" else jnp.bfloat16
    args = types.SimpleNamespace(
        n_bins=256, min_depth=1e-3, max_depth=10.0, norm="linear",
        encoder_name="efficientnet-b1", use_semantics=None,
        use_instance_segmentation=None, insertion_point="before-attn",
        image="rgb", remat="none", use_fused_head=False,
        min_depth_eval=1e-3, max_depth_eval=10.0, dataset="nyu",
        garg_crop=False, eigen_crop=True,
        hires_impl=os.environ.get("PROBE_HIRES", "native"))
    model = build_model(args, dtype=cdt)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((bs, h, w, 3), dtype=np.float32))
    depth = jnp.asarray(rng.random((bs, h, w, 1), dtype=np.float32) * 9.9 + 0.05)
    variables = model.init(jax.random.PRNGKey(0), img[:1], train=False)
    crop = jnp.asarray(eval_mask((h, w), dataset="nyu", garg_crop=False,
                                 eigen_crop=True))
    eval_step = make_eval_step(model, args, None, None)
    batch = {"image": img, "depth": depth}

    @functools.partial(jax.jit, static_argnums=(2,))
    def run_n(variables, batch, n):
        def body(carry, _):
            # thread the carry into the input so XLA cannot hoist the
            # loop-invariant eval computation out of the scan
            b = dict(batch, image=batch["image"] + carry * 1e-30)
            si, m = eval_step(variables["params"], variables["batch_stats"],
                              b, crop)
            return jnp.sum(si), m["abs_rel"][0]
        return jax.lax.scan(body, jnp.float32(0.0), None, length=n)

    t0 = time.time()
    acc, rels = run_n(variables, batch, ITERS)
    _ = float(rels[-1])
    compile_s = time.time() - t0
    t0 = time.time()
    acc, rels = run_n(variables, batch, ITERS)
    _ = float(rels[-1])
    dt = (time.time() - t0) / ITERS
    print(json.dumps({"metric": "eval step img/s (480x640, fwd + metrics)", "dtype": str(cdt.__name__), "hires": args.hires_impl,
                      "img_per_sec": round(bs / dt, 1),
                      "ms_per_step": round(1e3 * dt, 2), "bs": bs,
                      "compile_s": round(compile_s, 1)}))


if __name__ == "__main__":
    main()
