#!/usr/bin/env python
"""Bisect where the fused bins-head loses time inside the train step:
model fwd-only, fwd+bwd (no optimizer), with/without mesh shardings."""

import json
import os
import sys
import time
import types

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

B, H, W = 16, 416, 544
ITERS = 10


def timeit(name, fn, *args):
    """Chained timing with scalar readback — block_until_ready can return
    early over the axon tunnel (CLAUDE.md)."""
    out = fn(*args)
    small = jax.tree_util.tree_leaves(out)[-1]
    _ = float(jnp.reshape(small, (-1,))[0].astype(jnp.float32))
    a1 = args[1]
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(args[0], a1, *args[2:])
        small = jax.tree_util.tree_leaves(out)[-1]
        a1 = args[1] + (0 * jnp.sum(small)).astype(args[1].dtype)
    _ = float(jnp.reshape(small, (-1,))[0].astype(jnp.float32))
    ms = 1e3 * (time.perf_counter() - t0) / ITERS
    print(json.dumps({"which": name, "ms": round(ms, 2)}), flush=True)
    return out


def main():
    from mde_tpu.models import build_model
    from mde_tpu.ops.losses import silog_loss

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((B, H, W, 3), dtype=np.float32))
    depth = jnp.asarray(rng.random((B, H, W, 1), dtype=np.float32) * 9.9 + 0.05)

    for fused in (False, True):
        args = types.SimpleNamespace(
            n_bins=256, min_depth=1e-3, max_depth=10.0, norm="linear",
            encoder_name="efficientnet-b1", use_semantics=None,
            use_instance_segmentation=None, insertion_point="before-attn",
            image="rgb", remat="none", use_fused_head=fused)
        model = build_model(args, dtype=jnp.bfloat16)
        variables = model.init(jax.random.PRNGKey(0), img[:1], train=False)
        tag = "fused" if fused else "base"

        @jax.jit
        def fwd(v, x):
            return model.apply(v, x, train=False)[1]

        timeit(f"{tag} model fwd", fwd, variables, img)

        @jax.jit
        def vag(params, x, d):
            def loss_fn(p):
                _, pred = model.apply({"params": p,
                                       "batch_stats": variables["batch_stats"]},
                                      x, train=False)
                return silog_loss(pred, d, d > 1e-3, interpolate=True)
            return jax.value_and_grad(loss_fn)(params)

        timeit(f"{tag} model fwd+bwd", vag, variables["params"], img, depth)


if __name__ == "__main__":
    main()
