#!/usr/bin/env python
"""Bisect the decoder+mViT backward cost found by probe_step_breakdown.py.

The breakdown (2026-08-17, tunnel 98 TFLOP/s) put the flagship step at 252.7ms
with model fwd 45.8ms (44.6 TFLOP/s) but model fwd+bwd 240.9ms — and the
encoder only accounts for 57.7ms of that, leaving ~183ms in decoder+mViT whose
forward is ~26ms. This probe times each decoder stage and mViT piece under
value_and_grad (grads wrt params AND input, matching the train step) to find
which op's backward is pathological.

Segments (all bs16 416x544 B1 shapes, bf16 activations):
  dec / dec_g        whole DecoderBN fwd / fwd+bwd
  mvit / mvit_g      whole MViT head (train-mode dropout)
  up1_g .. up4_g     individual UpSampleBN blocks at their real shapes
  conv2_g, conv3_g   bottleneck 1x1 (with the padding quirk) / output conv
  patch_g            PatchTransformerEncoder alone (221 tokens)
  projdot_g          mViT conv3x3 + pixelwise dot product at 208x272
  resize_g           the 4 upsample resizes chained (f32 HIGHEST matmuls)

Usage: python scripts/probe_decoder_bisect.py   [SEGMENTS=a,b  PROBE_ITERS=n]
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


def feats(rng):
    """Encoder feature-list stand-ins at B1 416x544 shapes (indices the
    decoder consumes: 4, 5, 6, 8, 11)."""
    shapes = {4: (BS, H // 2, W // 2, 16), 5: (BS, H // 4, W // 4, 24),
              6: (BS, H // 8, W // 8, 40), 8: (BS, H // 16, W // 16, 112),
              11: (BS, H // 32, W // 32, 1280)}
    out = [None] * 12
    for i, s in shapes.items():
        out[i] = jnp.asarray(rng.standard_normal(s, dtype=np.float32), DT)
    return out


def grad_segment(name, module, x, extra=None, flag=True, flops=float("nan")):
    """Time value_and_grad of module.apply wrt (params, x) with train-mode
    BN/dropout. `extra` is a second traced input (concat skip). `flag` is the
    module's trailing bool: train=True for BN modules, deterministic=False
    for the dropout-flavored mViT modules."""
    inputs = (x,) if extra is None else (x, extra)
    variables = module.init({"params": jax.random.PRNGKey(0),
                             "dropout": jax.random.PRNGKey(1)},
                            *inputs, flag)
    params = variables.get("params", {})
    stats = variables.get("batch_stats", {})

    def loss(params, *inputs):
        kwargs = {"mutable": ["batch_stats"]} if stats else {}
        out = module.apply({"params": params, **({"batch_stats": stats} if stats else {})},
                           *inputs, flag,
                           rngs={"dropout": jax.random.PRNGKey(2)}, **kwargs)
        if stats:
            out = out[0]
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

    def seg_fwd(c, *arrs):
        return loss(params, arrs[0] + c * 1e-30, *arrs[1:]) * 1e-30

    def seg_g(c, *arrs):
        v, grads = jax.value_and_grad(loss, argnums=(0, 1))(
            params, arrs[0] + c * 1e-30, *arrs[1:])
        gsum = sum(jnp.sum(jnp.asarray(g, jnp.float32))
                   for g in jax.tree_util.tree_leaves(grads))
        return v * 1e-30 + 1e-30 * gsum

    timed_scan(name, seg_fwd, *inputs, flops=flops)
    timed_scan(name + "_g", seg_g, *inputs)


def main():
    from mde_tpu.models.decoder import DecoderBN, UpSampleBN
    from mde_tpu.models.mvit import MViT, PatchTransformerEncoder
    from mde_tpu.ops.resize import resize_bilinear_align_corners
    import flax.linen as nn

    print(json.dumps({"devices": [str(d) for d in jax.devices()],
                      "tunnel_tflops_pre": tunnel_health(), "bs": BS}),
          flush=True)

    rng = np.random.default_rng(0)
    fs = feats(rng)

    # --- whole decoder ----------------------------------------------------
    dec = DecoderBN(num_features=1280, num_classes=128, dtype=DT)
    dec_vars = dec.init(jax.random.PRNGKey(0), fs, True)

    def dec_loss(params, stats, f11):
        flist = list(fs)
        flist[11] = f11
        (out, _) = dec.apply({"params": params, "batch_stats": stats},
                             flist, True, mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32))

    dp, ds = dec_vars["params"], dec_vars["batch_stats"]

    def seg_dec(c, f11):
        return dec_loss(dp, ds, f11 + c * 1e-30) * 1e-30

    def seg_dec_g(c, f11):
        v, grads = jax.value_and_grad(dec_loss, argnums=(0, 2))(
            dp, ds, f11 + c * 1e-30)
        gsum = sum(jnp.sum(jnp.asarray(g, jnp.float32))
                   for g in jax.tree_util.tree_leaves(grads))
        return v * 1e-30 + gsum * 1e-30

    dec_flops = flops_of(lambda f11: dec_loss(dp, ds, f11), fs[11])
    timed_scan("dec", seg_dec, fs[11], flops=dec_flops)
    timed_scan("dec_g", seg_dec_g, fs[11])

    # --- mViT head --------------------------------------------------------
    x128 = jnp.asarray(rng.standard_normal((BS, H // 2, W // 2, 128),
                                           dtype=np.float32), DT)
    grad_segment("mvit", MViT(dtype=DT), x128, flag=False)       # deterministic=False
    grad_segment("patch", PatchTransformerEncoder(dtype=DT), x128, flag=False)

    class ProjDot(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            from mde_tpu.models.mvit import pixelwise_dot_product
            proj = nn.Conv(128, (3, 3), padding=1, name="conv3x3", dtype=DT)(x)
            q = self.param("q", nn.initializers.normal(), (BS, 128, 128), DT)
            return pixelwise_dot_product(proj, q)

    grad_segment("projdot", ProjDot(), x128)

    # --- individual decoder stages ---------------------------------------
    f = 1280
    x_d0 = jnp.asarray(rng.standard_normal(
        (BS, H // 32 + 2, W // 32 + 2, f), dtype=np.float32), DT)
    grad_segment("up1", UpSampleBN(f // 2, DT), x_d0, fs[8])
    x_d1 = jnp.asarray(rng.standard_normal(
        (BS, H // 16, W // 16, f // 2), dtype=np.float32), DT)
    grad_segment("up2", UpSampleBN(f // 4, DT), x_d1, fs[6])
    x_d2 = jnp.asarray(rng.standard_normal(
        (BS, H // 8, W // 8, f // 4), dtype=np.float32), DT)
    grad_segment("up3", UpSampleBN(f // 8, DT), x_d2, fs[5])
    x_d3 = jnp.asarray(rng.standard_normal(
        (BS, H // 4, W // 4, f // 8), dtype=np.float32), DT)
    grad_segment("up4", UpSampleBN(f // 16, DT), x_d3, fs[4])

    class Conv2Pad(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            return nn.Conv(f, (1, 1), name="conv2", dtype=DT)(x)

    grad_segment("conv2", Conv2Pad(), fs[11])

    class Conv3(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.Conv(128, (3, 3), padding=1, name="conv3", dtype=DT)(x)

    x_d4 = jnp.asarray(rng.standard_normal(
        (BS, H // 2, W // 2, f // 16), dtype=np.float32), DT)
    grad_segment("conv3", Conv3(), x_d4)

    # --- the 4 upsample resizes chained (no convs) ------------------------
    sizes = [(x_d0, (H // 16, W // 16)), (x_d1, (H // 8, W // 8)),
             (x_d2, (H // 4, W // 4)), (x_d3, (H // 2, W // 2))]

    def resize_chain(*xs):
        return sum(jnp.sum(resize_bilinear_align_corners(x, hw).astype(jnp.float32))
                   for x, hw in zip(xs, [s for _, s in sizes]))

    def seg_resize_g(c, *xs):
        v, grads = jax.value_and_grad(
            lambda *a: resize_chain(*a), argnums=tuple(range(len(xs))))(
            *[x + c * 1e-30 for x in xs])
        return v * 1e-30 + sum(jnp.sum(g.astype(jnp.float32))
                               for g in grads) * 1e-30

    timed_scan("resize_g", seg_resize_g, *[x for x, _ in sizes])

    print(json.dumps({"tunnel_tflops_post": tunnel_health()}), flush=True)


if __name__ == "__main__":
    main()
