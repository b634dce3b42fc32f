#!/usr/bin/env python
"""Bisect the EfficientNet-B1 encoder cost (the dominant remaining segment
after the patch-embed fix: encoder_g ~58 ms of the 145 ms flagship step at
~5 TFLOP/s — depthwise/small-channel convs that underutilize the MXU).

Times each encoder piece fwd and fwd+bwd at the bs16 416x544 shapes:
  stem        conv_stem 3x3 s2 (3->32) + BN + SiLU @ 208x272
  stage0..6   each MBConv stage at its real input shape
  dw_hr       one depthwise 3x3 @ 208x272x96 alone (VPU ceiling probe)
  pw_hr       one 1x1 16->96 @ 208x272 alone (skinny-matmul ceiling probe)

Usage: python scripts/probe_encoder_bisect.py  [SEGMENTS=a,b PROBE_ITERS=n]
       (the K^2 shifted-FMA formulation) instead of the lax grouped conv.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from probe_step_breakdown import timed_scan, tunnel_health, flops_of, BS, H, W

DT = jnp.bfloat16


def seg_pair(name, module, x, flops=float("nan")):
    variables = module.init({"params": jax.random.PRNGKey(0)}, x, True)
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def loss(params, x):
        out = module.apply(
            {"params": params, **({"batch_stats": stats} if stats else {})},
            x, True, mutable=["batch_stats"] if stats else False,
            rngs={"drop_path": jax.random.PRNGKey(2)})
        if stats:
            out = out[0]
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

    def s_fwd(c, x):
        return loss(params, x + c * 1e-30) * 1e-30

    def s_g(c, x):
        v, grads = jax.value_and_grad(loss, argnums=(0, 1))(params, x + c * 1e-30)
        gsum = sum(jnp.sum(jnp.asarray(g, jnp.float32))
                   for g in jax.tree_util.tree_leaves(grads))
        return v * 1e-30 + gsum * 1e-30

    timed_scan(name, s_fwd, x, flops=flops)
    timed_scan(name + "_g", s_g, x)


def main():
    import flax.linen as nn
    from mde_tpu.models.efficientnet import (
        DepthwiseSeparableBlock, InvertedResidualBlock, _B0_STAGES,
        round_channels, round_repeats, EFFICIENTNET_CONFIGS)

    print(json.dumps({"devices": [str(d) for d in jax.devices()],
                      "tunnel_tflops_pre": tunnel_health(), "bs": BS}),
          flush=True)

    rng = np.random.default_rng(0)
    width, depth = EFFICIENTNET_CONFIGS["efficientnet-b1"]

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            y = nn.Conv(round_channels(32, width), (3, 3), strides=2,
                        padding="SAME", use_bias=False, name="conv_stem",
                        dtype=DT)(x.astype(DT))
            y = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                             momentum=0.99, name="bn1", dtype=jnp.float32)(y)
            return nn.silu(y).astype(DT)

    x_in = jnp.asarray(rng.standard_normal((BS, H, W, 3), dtype=np.float32))
    seg_pair("stem", Stem(), x_in)

    class Stage(nn.Module):
        """One B1 MBConv stage at its real position."""
        stage_i: int

        @nn.compact
        def __call__(self, x, train=True):
            expand, kernel, stride, base_c, base_r = _B0_STAGES[self.stage_i]
            out_chs = round_channels(base_c, width)
            y = x
            for rep in range(round_repeats(base_r, depth)):
                s = stride if rep == 0 else 1
                in_chs = y.shape[-1]
                se_red = max(1, int(in_chs * 0.25))
                if expand == 1:
                    y = DepthwiseSeparableBlock(out_chs, kernel, s, se_red,
                                                0.1, DT,
                                                name=f"b{rep}")(y, train)
                else:
                    y = InvertedResidualBlock(out_chs, kernel, s, expand,
                                              se_red, 0.1, DT,
                                              name=f"b{rep}")(y, train)
            return y

    # stage input shapes for B1 at 416x544 (stride schedule 1,2,2,2,1,2,1):
    # chans[i] = stage-i input channels, in_res[i] = stage-i input H,W
    chans = [round_channels(32, width)] + \
            [round_channels(c, width) for (_, _, _, c, _) in _B0_STAGES]
    in_res = []
    cur = (H // 2, W // 2)
    for (_, _, stride, _, _) in _B0_STAGES:
        in_res.append(cur)
        if stride == 2:
            cur = (cur[0] // 2, cur[1] // 2)

    for i in range(7):
        hw = in_res[i]
        cin = chans[i]
        x = jnp.asarray(rng.standard_normal((BS, hw[0], hw[1], cin),
                                            dtype=np.float32), DT)
        seg_pair(f"stage{i}", Stage(i), x)

    # ceiling probes
    class DW(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            return nn.Conv(96, (3, 3), padding="SAME", feature_group_count=96,
                           use_bias=False, name="dw", dtype=DT)(x)

    xdw = jnp.asarray(rng.standard_normal((BS, H // 2, W // 2, 96),
                                          dtype=np.float32), DT)
    seg_pair("dw_hr", DW(), xdw)

    # (the 'shifts' and Pallas dw ceiling probes were retired with their
    # implementations — verdicts: 2.9/11.5 ms and 8.62 ms fwd vs XLA's
    # 0.5/0.7 at this site; README "Measured experiments")

    class PW(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            return nn.Conv(96, (1, 1), use_bias=False, name="pw", dtype=DT)(x)

    xpw = jnp.asarray(rng.standard_normal((BS, H // 2, W // 2, 16),
                                          dtype=np.float32), DT)
    seg_pair("pw_hr", PW(), xpw)

    # ---- layout ceilings (run with PROBE_ITERS=100 to beat the dispatch
    # floor). Question: does a C=16/32 NHWC tensor pay 128-lane-padded HBM
    # traffic on TPU? If ew_c16 ~= ew_c128 the minor dim is being padded and
    # the early encoder stages should move W onto lanes; if ew_c16 ~=
    # ew_c128/8 the layout is packed and the inefficiency is elsewhere.
    class Silu(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            return nn.silu(x * 1.0001)

    for cc in (16, 32, 128):
        xe = jnp.asarray(rng.standard_normal((BS, H // 2, W // 2, cc),
                                             dtype=np.float32), DT)
        seg_pair(f"ew_c{cc}", Silu(), xe)
    # same element count as ew_c16, W=272 on lanes instead of C=16
    xt = jnp.asarray(rng.standard_normal((BS, 16, H // 2, W // 2),
                                         dtype=np.float32), DT)
    seg_pair("ew_wlanes16", Silu(), xt)

    class DWnchw(nn.Module):
        """Depthwise 3x3 with the feature dim at position 1 (W on lanes)."""
        @nn.compact
        def __call__(self, x, train=True):
            kern = self.param("kernel", nn.initializers.lecun_normal(),
                              (3, 3, 1, 96))
            return jax.lax.conv_general_dilated(
                x, kern.astype(DT), (1, 1), "SAME",
                dimension_numbers=("NCHW", "HWIO", "NCHW"),
                feature_group_count=96)

    xdw_t = jnp.asarray(rng.standard_normal((BS, 96, H // 2, W // 2),
                                            dtype=np.float32), DT)
    seg_pair("dw_hr_nchw", DWnchw(), xdw_t)

    class PWnchw(nn.Module):
        """1x1 conv 16->96 in NCHW (W on lanes; contraction over dim 1)."""
        @nn.compact
        def __call__(self, x, train=True):
            kern = self.param("kernel", nn.initializers.lecun_normal(),
                              (1, 1, 16, 96))
            return jax.lax.conv_general_dilated(
                x, kern.astype(DT), (1, 1), "SAME",
                dimension_numbers=("NCHW", "HWIO", "NCHW"))

    xpw_t = jnp.asarray(rng.standard_normal((BS, 16, H // 2, W // 2),
                                            dtype=np.float32), DT)
    seg_pair("pw_hr_nchw", PWnchw(), xpw_t)

    print(json.dumps({"tunnel_tflops_post": tunnel_health()}), flush=True)


if __name__ == "__main__":
    main()
