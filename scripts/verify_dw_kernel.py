#!/usr/bin/env python
"""/verify drive for kernels/dw_conv.py on the REAL TPU: compile the Pallas
depthwise conv at a production encoder shape, check value + grad parity
against the lax grouped conv on-chip, and print timings. One JSON line."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from mde_tpu.kernels.dw_conv import dw_conv2d_pallas


def main():
    dev = jax.devices()[0]
    assert dev.platform == "tpu", f"verify drive needs the real TPU, got {dev}"
    rng = np.random.default_rng(0)
    b, h, w, c, k = 8, 208, 272, 96, 3
    x = jnp.asarray(rng.standard_normal((b, h, w, c), dtype=np.float32),
                    jnp.bfloat16)
    kern = jnp.asarray(rng.standard_normal((k, k, 1, c), dtype=np.float32) * .3,
                       jnp.bfloat16)

    def ref(x, kern):
        return jax.lax.conv_general_dilated(
            x, kern, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c, preferred_element_type=jnp.float32
        ).astype(x.dtype)

    t0 = time.perf_counter()
    got = jax.jit(lambda x, kk: dw_conv2d_pallas(x, kk, False))(x, kern)
    got_np = np.asarray(got, np.float32)
    compile_s = time.perf_counter() - t0
    ref_np = np.asarray(jax.jit(ref)(x, kern), np.float32)
    fwd_max_err = float(np.abs(got_np - ref_np).max())

    def loss_p(x, kk):
        return jnp.sum(dw_conv2d_pallas(x, kk, False).astype(jnp.float32) ** 2)

    def loss_r(x, kk):
        return jnp.sum(ref(x, kk).astype(jnp.float32) ** 2)

    gp = jax.jit(jax.grad(loss_p, argnums=(0, 1)))(x, kern)
    gr = jax.jit(jax.grad(loss_r, argnums=(0, 1)))(x, kern)
    dx_err = float(jnp.abs(gp[0].astype(jnp.float32) -
                           gr[0].astype(jnp.float32)).max())
    dk_rel = float((jnp.abs(gp[1].astype(jnp.float32) - gr[1].astype(jnp.float32))
                    / (jnp.abs(gr[1].astype(jnp.float32)) + 1.0)).max())
    ok = fwd_max_err < 0.05 and dx_err < 1.0 and dk_rel < 0.02
    print(json.dumps({"verify": "dw_conv_pallas_tpu", "ok": bool(ok),
                      "fwd_max_err": fwd_max_err, "dx_max_err": dx_err,
                      "dk_max_rel": dk_rel, "compile_s": round(compile_s, 1),
                      "shape": [b, h, w, c, k]}), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
