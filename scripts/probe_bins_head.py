#!/usr/bin/env python
"""Standalone TPU timing of the fused bins-head kernel vs the jnp path,
fwd and fwd+bwd, at the flagship operating point (bs16, 208x272, 256 bins)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

B, H, W, C, N = 16, 208, 272, 128, 256
ITERS = 20


def _first_scalar(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.reshape(leaf, (-1,))[0].astype(jnp.float32))


def timeit(name, fn, *args):
    """Chained timing with scalar readback — block_until_ready can return
    early over the axon tunnel (CLAUDE.md)."""
    out = fn(*args)
    _first_scalar(out)
    a0 = args[0]
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(a0, *args[1:])
        leaf = jax.tree_util.tree_leaves(out)[-1]  # smallest: cheap chain sum
        a0 = args[0] + jnp.zeros((), args[0].dtype)  # fresh buffer
        a0 = a0 + (0 * jnp.sum(leaf)).astype(a0.dtype)
    _first_scalar(out)
    ms = 1e3 * (time.perf_counter() - t0) / ITERS
    print(json.dumps({"which": name, "ms": round(ms, 3)}), flush=True)
    return out


def main():
    from mde_tpu.kernels.bins_head import fused_bins_head
    from mde_tpu.ops.bins import depth_from_bins

    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
    kernel = jnp.asarray(0.1 * rng.standard_normal((1, 1, C, N)), jnp.float32)
    bias = jnp.asarray(0.1 * rng.standard_normal((N,)), jnp.float32)
    centers = jnp.asarray(rng.random((B, N)) * 10, jnp.float32)

    def jnp_head(f, k, b, c):
        logits = jnp.einsum("bhwc,cn->bhwn", f, k[0, 0].astype(f.dtype))
        logits = (logits.astype(jnp.bfloat16) + b.astype(jnp.bfloat16)).astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        return depth_from_bins(probs, c)

    pall = jax.jit(fused_bins_head)
    ref = jax.jit(jnp_head)

    o1 = timeit("jnp fwd", ref, feats, kernel, bias, centers)
    o2 = timeit("pallas fwd", pall, feats, kernel, bias, centers)
    print(json.dumps({"which": "fwd max|diff|",
                      "v": float(jnp.max(jnp.abs(o1 - o2)))}), flush=True)

    def loss_p(f, k, b, c):
        return jnp.sum(fused_bins_head(f, k, b, c) ** 2)

    def loss_j(f, k, b, c):
        return jnp.sum(jnp_head(f, k, b, c) ** 2)

    gj = jax.jit(jax.grad(loss_j, argnums=(0, 1, 2, 3)))
    gp = jax.jit(jax.grad(loss_p, argnums=(0, 1, 2, 3)))
    g1 = timeit("jnp fwd+bwd", gj, feats, kernel, bias, centers)
    g2 = timeit("pallas fwd+bwd", gp, feats, kernel, bias, centers)
    for i, nm in enumerate(["dfeats", "dkernel", "dbias", "dcenters"]):
        d = float(jnp.max(jnp.abs(g1[i].astype(jnp.float32) - g2[i].astype(jnp.float32))))
        r = float(jnp.max(jnp.abs(g1[i].astype(jnp.float32))))
        print(json.dumps({"which": f"grad {nm} max|diff| / max|ref|",
                          "diff": d, "ref": r}), flush=True)


if __name__ == "__main__":
    main()
