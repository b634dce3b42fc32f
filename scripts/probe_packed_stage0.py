#!/usr/bin/env python
"""A/B: packed-lane (W->lanes) layout for the encoder's high-res stage 0.

Why: the encoder bisect (2026-08-18, CLAUDE.md) put stage0 — ONE
DepthwiseSeparableBlock at (16,208,272,32) — at ~13.6 ms fwd+bwd,
~20x off its dense HBM bound. C=32 uses 32/128 lanes, so every
elementwise/BN/SE/pw op pays ~4x padded HBM traffic. This probe measures a
layout fix that needs no Pallas: pack 4 consecutive W pixels into lanes
(B,H,W/4,4*C=128 — full lane density) and run the whole block packed:

  dw 3x3   -> an exactly-equivalent dense (3,3,128,128) conv whose weight is
              the depthwise kernel scattered over (g_in,g_out) lane-group
              pairs (zeros elsewhere). 4x redundant MXU FLOPs (66 GF vs 17)
              but MXU FLOPs are free at this size; HBM traffic drops 4x.
  BN       -> per-lane moments folded across the 4 lane groups (exact: equal
              counts per group), normalize broadcast back over groups.
  SE       -> per-lane spatial means folded to (B,C); 1x1 convs are tiny
              (B,C) matmuls; gates tiled back to 4C lanes.
  pw 1x1   -> block-diagonal matmul kron(I4, W) at full lane density.

All params stay in the canonical nn.Conv/flax-BN layout (the packed weights
are derived in-graph), so checkpoints are unaffected. Parity is asserted
in-probe against the real DepthwiseSeparableBlock at f32.

Segments (bs16 bf16 unless noted):
  ds_ref / ds_ref_g     real flax DS block fwd / fwd+bwd
  ds_pack / ds_pack_g   packed block incl. pack+unpack relayouts at the edges
  ds_packT / ds_packT_g packed block on an already-packed input / output
                        (the trunk steady state once the stem writes packed)
  dw_ref_g / dw_pack_g  the depthwise conv alone, fwd+bwd

Usage: python scripts/probe_packed_stage0.py  [SEGMENTS=a,b PROBE_ITERS=n]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from probe_step_breakdown import timed_scan, tunnel_health, BS, H, W

DT = jnp.bfloat16
C = 32        # stage-0 input channels (B1 stem)
CO = 16       # stage-0 output channels
SER = 8       # SE reduced channels (in_chs * 0.25)
P = 4         # pack factor: 4 * 32 = 128 lanes
HS, WS = H // 2, W // 2   # 208 x 272, the stage-0 resolution
EPS = 1e-3


def pack(x):
    b, h, w, c = x.shape
    return x.reshape(b, h, w // P, P * c)


def unpack(x, c):
    b, h, w4, pc = x.shape
    return x.reshape(b, h, w4 * P, c)


def dw_dense_weight(k):
    """(3,3,1,C) depthwise kernel -> (3,3,P*C,P*C) packed-equivalent dense
    conv weight (HWIO). Output lane (g_out,c) at packed col t takes tap dj
    from input lane (g_in,c) at col t+o where g_in=(g_out+dj-1)%P and
    o=floor((g_out+dj-1)/P); with SAME padding of 1 packed col this
    reproduces TF-SAME on the original W exactly (extra pad lanes are only
    reachable where the original pad would be, and are zero)."""
    kh = k.shape[0]
    wd = jnp.zeros((kh, 3, P * C, P * C), k.dtype)
    ar = jnp.arange(C)
    for dj in range(3):
        for g_out in range(P):
            s = g_out + dj - 1
            g_in, o = s % P, s // P
            wd = wd.at[:, o + 1, g_in * C + ar, g_out * C + ar].set(
                k[:, dj, 0, :])
    return wd


def bn_train_packed(x, scale, bias):
    """flax-BN train-mode math on packed lanes: per-lane moments folded
    across the P lane groups (exact — every group covers the same number of
    elements), normalized in f32, affine per canonical channel."""
    xf = x.astype(jnp.float32)
    m = jnp.mean(xf, axis=(0, 1, 2))                # (P*C,)
    m2 = jnp.mean(jnp.square(xf), axis=(0, 1, 2))
    c = scale.shape[0]
    mc = jnp.mean(m.reshape(P, c), axis=0)
    vc = jnp.mean(m2.reshape(P, c), axis=0) - jnp.square(mc)
    mt = jnp.tile(mc, P)
    inv = jnp.tile(jax.lax.rsqrt(vc + EPS) * scale, P)
    return ((xf - mt) * inv + jnp.tile(bias, P)).astype(jnp.float32)


def ds_block_packed(p, xp):
    """Packed stage-0 DS block: dw3x3 -> BN -> SiLU -> SE -> pw -> BN.
    xp (B,H,W/P,P*C) bf16; returns (B,H,W/P,P*CO) bf16."""
    wd = dw_dense_weight(p["dw"].astype(DT))
    y = jax.lax.conv_general_dilated(
        xp, wd, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = bn_train_packed(y, p["bn1_scale"], p["bn1_bias"]).astype(DT)
    y = jax.nn.silu(y)
    # SE: fold per-lane spatial means to (B, C)
    s = jnp.mean(y.astype(jnp.float32), axis=(1, 2))        # (B, P*C)
    s = jnp.mean(s.reshape(-1, P, C), axis=1).astype(DT)    # (B, C)
    g = jax.nn.silu(s @ p["se_red_w"].astype(DT) + p["se_red_b"].astype(DT))
    g = jax.nn.sigmoid(g @ p["se_exp_w"].astype(DT) + p["se_exp_b"].astype(DT))
    y = y * jnp.tile(g, P)[:, None, None, :]
    # pw 32->16 as block-diagonal matmul (full lane density)
    wpd = jnp.kron(jnp.eye(P, dtype=DT), p["pw"].astype(DT))  # (P*C, P*CO)
    y = y @ wpd
    y = bn_train_packed(y, p["bn2_scale"], p["bn2_bias"]).astype(DT)
    return y


def ref_params(rng):
    k = {
        "dw": jnp.asarray(rng.standard_normal((3, 3, 1, C), np.float32)) * 0.2,
        "bn1_scale": jnp.asarray(rng.standard_normal(C, np.float32)) * 0.1 + 1,
        "bn1_bias": jnp.asarray(rng.standard_normal(C, np.float32)) * 0.1,
        "se_red_w": jnp.asarray(rng.standard_normal((C, SER), np.float32)) * 0.2,
        "se_red_b": jnp.asarray(rng.standard_normal(SER, np.float32)) * 0.1,
        "se_exp_w": jnp.asarray(rng.standard_normal((SER, C), np.float32)) * 0.2,
        "se_exp_b": jnp.asarray(rng.standard_normal(C, np.float32)) * 0.1,
        "pw": jnp.asarray(rng.standard_normal((C, CO), np.float32)) * 0.2,
        "bn2_scale": jnp.asarray(rng.standard_normal(CO, np.float32)) * 0.1 + 1,
        "bn2_bias": jnp.asarray(rng.standard_normal(CO, np.float32)) * 0.1,
    }
    return k


def to_flax(p):
    return {
        "params": {
            "conv_dw": {"kernel": p["dw"]},
            "bn1": {"scale": p["bn1_scale"], "bias": p["bn1_bias"]},
            "se": {"conv_reduce": {"kernel": p["se_red_w"][None, None],
                                   "bias": p["se_red_b"]},
                   "conv_expand": {"kernel": p["se_exp_w"][None, None],
                                   "bias": p["se_exp_b"]}},
            "conv_pw": {"kernel": p["pw"][None, None]},
            "bn2": {"scale": p["bn2_scale"], "bias": p["bn2_bias"]},
        },
        "batch_stats": {
            "bn1": {"mean": jnp.zeros(C), "var": jnp.ones(C)},
            "bn2": {"mean": jnp.zeros(CO), "var": jnp.ones(CO)},
        },
    }


def main():
    from mde_tpu.models.efficientnet import DepthwiseSeparableBlock

    print(json.dumps({"devices": [str(d) for d in jax.devices()],
                      "tunnel_tflops_pre": tunnel_health(), "bs": BS}),
          flush=True)

    rng = np.random.default_rng(0)
    p = ref_params(rng)
    fvars = to_flax(p)
    x = jnp.asarray(rng.standard_normal((BS, HS, WS, C), np.float32), DT)
    blk = DepthwiseSeparableBlock(CO, 3, 1, SER, dtype=DT)

    # ---- parity check (one jit call each) ---------------------------------
    ref_out = jax.jit(lambda v, x: blk.apply(
        v, x, True, mutable=["batch_stats"])[0])(fvars, x)
    pk_out = jax.jit(lambda p, x: unpack(ds_block_packed(p, pack(x)), CO))(p, x)
    diff = float(jnp.max(jnp.abs(ref_out.astype(jnp.float32) -
                                 pk_out.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(ref_out.astype(jnp.float32)))) or 1.0
    print(json.dumps({"parity_max_abs": round(diff, 5),
                      "rel": round(diff / scale, 5)}), flush=True)

    # ---- timings -----------------------------------------------------------
    def ref_fwd(v, x):
        out, _ = blk.apply(v, x, True, mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32))

    def seg_ref(c, x):
        return ref_fwd(fvars, x + c * 1e-30) * 1e-30

    def seg_ref_g(c, x):
        v, g = jax.value_and_grad(ref_fwd, argnums=(0, 1))(
            fvars, x + c * 1e-30)
        return v * 1e-30 + 1e-30 * sum(
            jnp.sum(t.astype(jnp.float32)) for t in jax.tree_util.tree_leaves(g))

    timed_scan("ds_ref", seg_ref, x)
    timed_scan("ds_ref_g", seg_ref_g, x)

    def pk_fwd(p, x):
        return jnp.sum(unpack(ds_block_packed(p, pack(x)), CO)
                       .astype(jnp.float32))

    def seg_pk(c, x):
        return pk_fwd(p, x + c * 1e-30) * 1e-30

    def seg_pk_g(c, x):
        v, g = jax.value_and_grad(pk_fwd, argnums=(0, 1))(p, x + c * 1e-30)
        return v * 1e-30 + 1e-30 * sum(
            jnp.sum(t.astype(jnp.float32)) for t in jax.tree_util.tree_leaves(g))

    timed_scan("ds_pack", seg_pk, x)
    timed_scan("ds_pack_g", seg_pk_g, x)

    # trunk steady state: input already packed, output stays packed
    xp = pack(x)

    def pkT_fwd(p, xp):
        return jnp.sum(ds_block_packed(p, xp).astype(jnp.float32))

    def seg_pkT(c, xp):
        return pkT_fwd(p, xp + c * 1e-30) * 1e-30

    def seg_pkT_g(c, xp):
        v, g = jax.value_and_grad(pkT_fwd, argnums=(0, 1))(p, xp + c * 1e-30)
        return v * 1e-30 + 1e-30 * sum(
            jnp.sum(t.astype(jnp.float32)) for t in jax.tree_util.tree_leaves(g))

    timed_scan("ds_packT", seg_pkT, xp)
    timed_scan("ds_packT_g", seg_pkT_g, xp)

    # ---- dw conv alone ------------------------------------------------------
    def dwref(k, x):
        return jnp.sum(jax.lax.conv_general_dilated(
            x, k.astype(DT), (1, 1), "SAME", feature_group_count=C,
            dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(jnp.float32))

    def seg_dwref_g(c, x):
        v, g = jax.value_and_grad(dwref, argnums=(0, 1))(p["dw"], x + c * 1e-30)
        return v * 1e-30 + 1e-30 * (jnp.sum(g[0]) +
                                    jnp.sum(g[1].astype(jnp.float32)))

    timed_scan("dw_ref_g", seg_dwref_g, x)

    def dwpk(k, xp):
        wd = dw_dense_weight(k.astype(DT))
        return jnp.sum(jax.lax.conv_general_dilated(
            xp, wd, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(jnp.float32))

    def seg_dwpk_g(c, xp):
        v, g = jax.value_and_grad(dwpk, argnums=(0, 1))(p["dw"], xp + c * 1e-30)
        return v * 1e-30 + 1e-30 * (jnp.sum(g[0]) +
                                    jnp.sum(g[1].astype(jnp.float32)))

    timed_scan("dw_pack_g", seg_dwpk_g, xp)

    print(json.dumps({"tunnel_tflops_post": tunnel_health()}), flush=True)


if __name__ == "__main__":
    main()
