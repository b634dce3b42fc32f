#!/usr/bin/env python
"""A/B two XLA-level formulations at the flagship hot shapes (bs16 416x544 B1).

1) Pointwise 1x1 convs at the high-res encoder sites. The encoder bisect
   (CLAUDE.md 2026-08-18) put the pw 1x1 16->96 fwd+bwd at ~3.4 ms, ~6x off
   its HBM bound; the patch-embed fix proved XLA can lower a conv's backward
   far from the equivalent matmul's. Compare lax-conv vs reshape-matmul
   (identical arithmetic; NHWC 1x1 conv IS a matmul over N*H*W rows):
     pwc_expand / pwm_expand    16 -> 96  at 208x272  (stage0 expand)
     pwc_project / pwm_project  96 -> 16  at 208x272  (stage0 project)
   each also as *_g = fwd+bwd wrt (input, weight).

2) The decoder's align_corners=True upsample. The dense separable-matmul form
   (ops/resize.py) costs ~0.5 TFLOP fwd at the up4 site (104x136->208x272,
   C=160, bs16) for a 2-tap kernel — ~100x the necessary FLOPs, ~5 ms at
   MXU rate, vs ~0.6 ms of pure HBM traffic. Compare with a take-based 2-tap
   form (gather of full (W,C) rows — XLA TPU handles monotone row gathers
   as slice loops; whether that beats the MXU matmul is exactly the question):
     rsz_matmul / rsz_take      (+ _g variants, grads wrt input)

Usage: python scripts/probe_pw_resize.py   [SEGMENTS=a,b PROBE_ITERS=n]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from probe_step_breakdown import timed_scan, tunnel_health

DT = jnp.bfloat16
BS, HH, WW = 16, 208, 272  # stage0 / decoder-up4-output resolution


def pw_pair(name, cin, cout):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BS, HH, WW, cin), np.float32), DT)
    w = jnp.asarray(rng.standard_normal((cin, cout), np.float32) * 0.05, DT)

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w.reshape(1, 1, cin, cout), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def matmul(x, w):
        y = x.reshape(-1, cin) @ w
        return y.reshape(BS, HH, WW, cout)

    for tag, fn in (("pwc", conv), ("pwm", matmul)):
        def fwd(c, x, w, fn=fn):
            return jnp.sum(fn((x + c * 1e-30).astype(DT), w)
                           .astype(jnp.float32)) * 1e-30

        def fg(c, x, w, fn=fn):
            def loss(x, w):
                return jnp.sum(fn(x, w).astype(jnp.float32))
            v, (gx, gw) = jax.value_and_grad(loss, argnums=(0, 1))(
                (x + c * 1e-30).astype(DT), w)
            return (v + jnp.sum(gx.astype(jnp.float32))
                    + jnp.sum(gw.astype(jnp.float32))) * 1e-30

        timed_scan(f"{tag}_{name}", fwd, x, w)
        timed_scan(f"{tag}_{name}_g", fg, x, w)


def resize_pair():
    from mde_tpu.ops.resize import (resize_bilinear_align_corners,
                                    _linear_weights_align_corners)

    rng = np.random.default_rng(1)
    x = jnp.asarray(
        rng.standard_normal((BS, HH // 2, WW // 2, 160), np.float32), DT)
    out_hw = (HH, WW)

    def take2tap(x, out_hw):
        """2-tap bilinear align_corners via row-takes, f32 combine."""
        y = x.astype(jnp.float32)
        for axis, (n_in, n_out) in ((-3, (x.shape[-3], out_hw[0])),
                                    (-2, (x.shape[-2], out_hw[1]))):
            wmat = _linear_weights_align_corners(n_in, n_out)
            lo = np.clip(np.argmax(wmat > 0, axis=1), 0, n_in - 2)
            wlo = wmat[np.arange(n_out), lo]
            shape = [1, 1, 1, 1]
            shape[axis] = n_out
            y = (jnp.take(y, jnp.asarray(lo), axis=axis)
                 * jnp.asarray(wlo, jnp.float32).reshape(shape)
                 + jnp.take(y, jnp.asarray(lo + 1), axis=axis)
                 * jnp.asarray(1.0 - wlo, jnp.float32).reshape(shape))
        return y.astype(x.dtype)

    # value check (tolerate bf16 rounding differences between the two forms)
    ref = np.asarray(resize_bilinear_align_corners(x, out_hw), np.float32)
    got = np.asarray(take2tap(x, out_hw), np.float32)
    err = float(np.max(np.abs(ref - got)))
    print(json.dumps({"resize_forms_max_abs_diff": err}), flush=True)

    # dense separable matmul pinned (the public fn now routes exact-2x bf16
    # to the interleave path, so call the matmul core directly for the A leg)
    from mde_tpu.ops.resize import _separable_matmuls

    def dense_matmul(x, out_hw):
        wh = jnp.asarray(_linear_weights_align_corners(x.shape[-3], out_hw[0]))
        ww = jnp.asarray(_linear_weights_align_corners(x.shape[-2], out_hw[1]))
        y = _separable_matmuls(wh, ww, x.astype(jnp.float32),
                               jax.lax.Precision.DEFAULT)
        return y.astype(x.dtype)

    for tag, fn in (("rsz_matmul", dense_matmul),
                    ("rsz_interleave", resize_bilinear_align_corners),
                    ("rsz_take", take2tap)):
        def fwd(c, x, fn=fn):
            return jnp.sum(fn(x + c * 1e-30, out_hw).astype(jnp.float32)) * 1e-30

        def fg(c, x, fn=fn):
            def loss(x):
                return jnp.sum(fn(x, out_hw).astype(jnp.float32))
            v, gx = jax.value_and_grad(loss)(x + c * 1e-30)
            return (v + jnp.sum(gx.astype(jnp.float32))) * 1e-30

        timed_scan(tag, fwd, x)
        timed_scan(tag + "_g", fg, x)


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()],
                      "tunnel_tflops_pre": tunnel_health()}), flush=True)
    pw_pair("expand", 16, 96)
    pw_pair("project", 96, 16)
    resize_pair()
    print(json.dumps({"tunnel_tflops_post": tunnel_health()}), flush=True)


if __name__ == "__main__":
    main()
