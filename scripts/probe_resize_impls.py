#!/usr/bin/env python
"""A/B resize lowerings at the decoder's four upsample shapes (bs16 B1
416x544 operating point). probe_up4_bisect 2026-08-19 (stamps 112-113)
put the up4 resize at ~5.7/8.3 ms net fwd / fwd+bwd vs a ~0.5 ms FLOP
bound: the bf16 path pays an f32 cast + f32 intermediates that DEFAULT
precision immediately downconverts again on the MXU.

Variants (each timed fwd and fwd+bwd over the 4-resize chain):

  f32cast   production form: astype(f32), f32 weights, DEFAULT precision
  bf16      bf16 operands + bf16 weights, preferred_element_type=f32
  bf16_wf   same but W-contraction first, then H
  bf16_one  single einsum 'oh,pw,bhwc->bopc' (XLA picks the order)

Usage: python scripts/probe_resize_impls.py  [VARIANTS=a,b PROBE_ITERS=n]
"""

import functools
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from probe_step_breakdown import timed_scan, tunnel_health, BS

from mde_tpu.ops.resize import _linear_weights_align_corners

# (in_h, in_w, ch) -> (2h, 2w) for up1..up4 at 416x544 B1
SIZES = [(15, 19, 1280, 26, 34),
         (26, 34, 640, 52, 68),
         (52, 68, 320, 104, 136),
         (104, 136, 160, 208, 272)]


def weights(h, oh, w, ow, dtype):
    wh = jnp.asarray(_linear_weights_align_corners(h, oh), dtype=dtype)
    ww = jnp.asarray(_linear_weights_align_corners(w, ow), dtype=dtype)
    return wh, ww


def r_f32cast(x, oh, ow):
    wh, ww = weights(x.shape[1], oh, x.shape[2], ow, jnp.float32)
    xf = x.astype(jnp.float32)
    y = jnp.einsum('oh,bhwc->bowc', wh, xf, precision=jax.lax.Precision.DEFAULT)
    y = jnp.einsum('pw,bowc->bopc', ww, y, precision=jax.lax.Precision.DEFAULT)
    return y.astype(x.dtype)


def r_bf16(x, oh, ow):
    wh, ww = weights(x.shape[1], oh, x.shape[2], ow, jnp.bfloat16)
    y = jnp.einsum('oh,bhwc->bowc', wh, x,
                   preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    y = jnp.einsum('pw,bowc->bopc', ww, y,
                   preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


def r_bf16_wf(x, oh, ow):
    wh, ww = weights(x.shape[1], oh, x.shape[2], ow, jnp.bfloat16)
    y = jnp.einsum('pw,bhwc->bhpc', ww, x,
                   preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    y = jnp.einsum('oh,bhpc->bopc', wh, y,
                   preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


def r_bf16_one(x, oh, ow):
    wh, ww = weights(x.shape[1], oh, x.shape[2], ow, jnp.bfloat16)
    y = jnp.einsum('oh,pw,bhwc->bopc', wh, ww, x,
                   preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


def r_bf16_tr(x, oh, ow):
    """W-resize as a MINOR-axis contraction: transpose C<->W so the dot
    contracts the lane dim (one big clean matmul), then transpose back.
    Hypothesis: the generic 'pw,bowc->bopc' form is slow because the
    contraction runs over the second-minor axis with C on lanes (up4's
    resize measured 8.12 ms vs a ~0.5 ms traffic bound)."""
    wh, ww = weights(x.shape[1], oh, x.shape[2], ow, jnp.bfloat16)
    y = jnp.einsum('oh,bhwc->bowc', wh, x,
                   preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    yt = jnp.swapaxes(y, -1, -2)                      # (B, Ho, C, w)
    z = jnp.einsum('pw,bhcw->bhcp', ww, yt,
                   preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    return jnp.swapaxes(z, -1, -2).astype(x.dtype)


def r_f32_tr(x, oh, ow):
    """Same transposed W-contraction at production (f32cast) numerics."""
    wh, ww = weights(x.shape[1], oh, x.shape[2], ow, jnp.float32)
    xf = x.astype(jnp.float32)
    y = jnp.einsum('oh,bhwc->bowc', wh, xf, precision=jax.lax.Precision.DEFAULT)
    yt = jnp.swapaxes(y, -1, -2)
    z = jnp.einsum('pw,bhcw->bhcp', ww, yt, precision=jax.lax.Precision.DEFAULT)
    return jnp.swapaxes(z, -1, -2).astype(x.dtype)


VARIANTS = {"f32cast": r_f32cast, "bf16": r_bf16, "bf16_wf": r_bf16_wf,
            "bf16_one": r_bf16_one, "bf16_tr": r_bf16_tr, "f32_tr": r_f32_tr}


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()],
                      "tunnel_tflops_pre": tunnel_health(), "bs": BS}),
          flush=True)
    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.standard_normal((BS, h, w, c), np.float32),
                      jnp.bfloat16) for h, w, c, _, _ in SIZES]

    # value check vs the f32cast form (bf16 weights round interpolation
    # coefficients: expect ~1e-2 relative, fine for the bf16 train path)
    ref = [np.asarray(r_f32cast(x, oh, ow), np.float32)
           for x, (_, _, _, oh, ow) in zip(xs, SIZES)]
    for name, fn in VARIANTS.items():
        errs = []
        for x, (_, _, _, oh, ow), r in zip(xs, SIZES, ref):
            out = np.asarray(fn(x, oh, ow), np.float32)
            errs.append(float(np.max(np.abs(out - r)) / (np.max(np.abs(r)) + 1e-9)))
        print(json.dumps({"variant": name, "max_rel_err": max(errs)}), flush=True)

    wanted = os.environ.get("VARIANTS")
    for name, fn in VARIANTS.items():
        if wanted and name not in wanted.split(","):
            continue

        def chain(*inputs):
            tot = jnp.zeros((), jnp.float32)
            for x, (_, _, _, oh, ow) in zip(inputs, SIZES):
                tot = tot + jnp.sum(fn(x, oh, ow).astype(jnp.float32))
            return tot

        def fwd(c, *inputs):
            return chain(inputs[0] + c * 1e-30, *inputs[1:]) * 1e-30

        def fwd_g(c, *inputs):
            v, gs = jax.value_and_grad(chain, argnums=tuple(range(len(inputs))))(
                inputs[0] + c * 1e-30, *inputs[1:])
            return v * 1e-30 + 1e-30 * sum(jnp.sum(g.astype(jnp.float32))
                                           for g in gs)

        timed_scan(name, fwd, *xs)
        timed_scan(name + "_g", fwd_g, *xs)

    print(json.dumps({"tunnel_tflops_post": tunnel_health()}), flush=True)


if __name__ == "__main__":
    main()
