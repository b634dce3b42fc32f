#!/usr/bin/env python
"""Sub-bisect UpSampleBN up4 — the decoder's hotspot (probe_decoder_bisect
2026-08-19: up4 fwd 16.2 ms vs a ~3.7 ms FLOP bound, up4_g 27.6 ms at bs16).

Times each constituent at up4's real shapes (in (BS,104,136,160) + skip
(BS,208,272,16) -> out (BS,208,272,80)):

  resize       bilinear align-corners 104x136 -> 208x272 on 160 ch
  conv_a       3x3 176->80 at 208x272 (the concat input)
  conv_apad    3x3 176->128 at 208x272 (lane-util control: N=128 vs 80)
  bnlrelu      f32 BatchNorm + leaky_relu at 208x272x80
  conv_b       3x3 80->80 at 208x272
  concat       the channel concat relayout alone
  full         whole UpSampleBN (reference segment)

Each segment is scan-timed fwd and fwd+bwd (_g) like probe_decoder_bisect.
Usage: python scripts/probe_up4_bisect.py  [SEGMENTS=a,b PROBE_ITERS=n]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from probe_step_breakdown import timed_scan, tunnel_health, BS
from probe_decoder_bisect import grad_segment

DT = jnp.bfloat16
H4, W4 = 104, 136          # up4 input spatial
H2, W2 = 208, 272          # up4 output spatial


def main():
    import flax.linen as nn
    from mde_tpu.ops.resize import resize_bilinear_align_corners
    from mde_tpu.models.decoder import UpSampleBN

    print(json.dumps({"devices": [str(d) for d in jax.devices()],
                      "tunnel_tflops_pre": tunnel_health(), "bs": BS}),
          flush=True)

    rng = np.random.default_rng(0)
    x_in = jnp.asarray(rng.standard_normal((BS, H4, W4, 160), np.float32), DT)
    skip = jnp.asarray(rng.standard_normal((BS, H2, W2, 16), np.float32), DT)
    x_cat = jnp.asarray(rng.standard_normal((BS, H2, W2, 176), np.float32), DT)
    x_80 = jnp.asarray(rng.standard_normal((BS, H2, W2, 80), np.float32), DT)

    class Resize(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return resize_bilinear_align_corners(x, (H2, W2))

    class ConvA(nn.Module):
        out: int = 80

        @nn.compact
        def __call__(self, x, train=False):
            return nn.Conv(self.out, (3, 3), padding=1, name="conv",
                           dtype=DT)(x)

    class BnLRelu(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            y = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                             momentum=0.9, name="bn", dtype=jnp.float32)(x)
            return nn.leaky_relu(y.astype(DT), 0.01)

    class Concat(nn.Module):
        @nn.compact
        def __call__(self, x, skip, train=False):
            return jnp.concatenate([x, skip.astype(DT)], axis=-1) * 1.0

    segs = {
        "resize": lambda: grad_segment("resize", Resize(), x_in),
        "conv_a": lambda: grad_segment("conv_a", ConvA(80), x_cat),
        "conv_apad": lambda: grad_segment("conv_apad", ConvA(128), x_cat),
        "bnlrelu": lambda: grad_segment("bnlrelu", BnLRelu(), x_80, flag=True),
        "conv_b": lambda: grad_segment("conv_b", ConvA(80), x_80),
        "concat": lambda: grad_segment(
            "concat", Concat(), jnp.asarray(
                rng.standard_normal((BS, H2, W2, 160), np.float32), DT), skip),
        "full": lambda: grad_segment("full", UpSampleBN(80, DT), x_in, skip,
                                     flag=True),
        # ("fullf"/"ka" fused up-block variants retired in r5 — measured
        # +23% in-step loss, kernels/up_block.py deleted)
    }
    wanted = os.environ.get("SEGMENTS")
    for name, fn in segs.items():
        if wanted and name not in wanted.split(","):
            continue
        fn()

    print(json.dumps({"tunnel_tflops_post": tunnel_health()}), flush=True)


if __name__ == "__main__":
    main()
