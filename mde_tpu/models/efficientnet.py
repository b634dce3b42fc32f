"""EfficientNet encoder (tf_efficientnet_b1_ap / b5_ap), flax/NHWC.

The reference pulls `tf_efficientnet_{b1,b5}_ap` from torch.hub
(reference models/unet_adaptive_bins.py:315-330) and walks its module dict to
collect every intermediate feature map (models/unet_adaptive_bins.py:103-116).
Here the architecture is re-derived from the EfficientNet recipe
(arXiv 1905.11946: width/depth compounding over the B0 stage table) rather
than ported: NHWC layout, lax 'SAME' padding (the TF semantics the reference
re-implements by hand in torch at unet_adaptive_bins.py:11-36 — native in XLA),
bf16 activations / f32 params, stochastic depth via per-block Bernoulli masks.

The encoder returns the same feature-list indexing contract the decoder
relies on (reference unet_adaptive_bins.py:84-85):
    features[0]  input
    features[1]  conv_stem out          features[2] stem BN out
    features[3]  stem act out
    features[4..10]  the 7 MBConv stage outputs
    features[11] conv_head out          features[12] head BN  features[13] head act
"""

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

# B0 stage table: (expand_ratio, kernel, stride, base_channels, base_repeats)
_B0_STAGES = (
    (1, 3, 1, 16, 1),
    (6, 3, 2, 24, 2),
    (6, 5, 2, 40, 2),
    (6, 3, 2, 80, 3),
    (6, 5, 1, 112, 3),
    (6, 5, 2, 192, 4),
    (6, 3, 1, 320, 1),
)

EFFICIENTNET_CONFIGS = {
    # name: (width_mult, depth_mult)
    "efficientnet-b1": (1.0, 1.1),
    "efficientnet-b5": (1.6, 2.2),
}

_BN_EPS_TF = 1e-3  # tf_ variants use eps 1e-3


def round_channels(channels: float, multiplier: float, divisor: int = 8) -> int:
    """EfficientNet channel rounding (round-to-divisor, never below 90%)."""
    channels *= multiplier
    new_c = max(divisor, int(channels + divisor / 2) // divisor * divisor)
    if new_c < 0.9 * channels:
        new_c += divisor
    return int(new_c)


def round_repeats(repeats: int, multiplier: float) -> int:
    return int(math.ceil(repeats * multiplier))


def _drop_path(x, rate: float, deterministic: bool, rng):
    """Stochastic depth on the residual branch (per-sample Bernoulli)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask_shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, mask_shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def _dw_conv(kernel: int, stride: int, dtype, chs: int):
    """Depthwise conv: XLA's grouped conv, measured near the HBM bound at the
    hot sites (208x272x96: ~0.5/0.7 ms fwd / fwd+bwd vs the 0.44 ms bound).
    Two alternatives were built, measured in-step, and RETIRED (r4 policy —
    see README "Measured experiments"): K^2 shifted-FMA 'shifts' (lost 1.6x,
    re-reads the padded input K^2 times from HBM; e322010..2026-08-18) and a
    Pallas halo-tile kernel (fwd 3x loss, 95f019d)."""
    return nn.Conv(chs, (kernel, kernel), strides=stride, padding="SAME",
                   feature_group_count=chs, use_bias=False, name="conv_dw",
                   dtype=dtype)


def _pw_conv(out_chs, dtype, name: str):
    """conv_pw/conv_pwl/conv_head 1x1 conv. An explicit-matmul lowering
    ('--pw_impl matmul') was built and RETIRED in r5 (README "Measured
    experiments"): bs16 126.32 conv vs 127.38 matmul, bs32 235.70 vs
    250.42 (stamps 106-112) — XLA already lowers in-graph 1x1 convs to
    efficient dots; the patch-embed pathology was specific to strided
    dense-dilated input-grads."""
    return nn.Conv(out_chs, (1, 1), use_bias=False, name=name, dtype=dtype)


class SqueezeExcite(nn.Module):
    """SE gate; reduction is computed from the block *input* channels
    (gen-efficientnet convention), passed in as reduced_chs."""
    reduced_chs: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        gates = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True).astype(self.dtype)
        gates = nn.Conv(self.reduced_chs, (1, 1), name="conv_reduce", dtype=self.dtype)(gates)
        gates = nn.silu(gates)
        gates = nn.Conv(x.shape[-1], (1, 1), name="conv_expand", dtype=self.dtype)(gates)
        return x * nn.sigmoid(gates)


class DepthwiseSeparableBlock(nn.Module):
    """Stage-0 block: dw conv -> BN -> SiLU -> SE -> pw conv -> BN (+skip)."""
    out_chs: int
    kernel: int
    stride: int
    se_reduced_chs: int
    drop_path_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        shortcut = x
        in_chs = x.shape[-1]
        y = _dw_conv(self.kernel, self.stride, self.dtype, in_chs)(x)
        y = nn.BatchNorm(use_running_average=not train, epsilon=_BN_EPS_TF,
                         momentum=0.99, name="bn1", dtype=jnp.float32)(y)
        y = nn.silu(y.astype(self.dtype))
        y = SqueezeExcite(self.se_reduced_chs, dtype=self.dtype, name="se")(y)
        y = _pw_conv(self.out_chs, self.dtype, "conv_pw")(y)
        y = nn.BatchNorm(use_running_average=not train, epsilon=_BN_EPS_TF,
                         momentum=0.99, name="bn2", dtype=jnp.float32)(y).astype(self.dtype)
        if self.stride == 1 and in_chs == self.out_chs:
            rng = self.make_rng("drop_path") if train and self.drop_path_rate > 0 else None
            y = _drop_path(y, self.drop_path_rate, not train, rng) + shortcut
        return y


class InvertedResidualBlock(nn.Module):
    """MBConv: pw expand -> dw -> SE -> pw project, with skip + drop-path."""
    out_chs: int
    kernel: int
    stride: int
    expand_ratio: int
    se_reduced_chs: int
    drop_path_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        shortcut = x
        in_chs = x.shape[-1]
        mid_chs = in_chs * self.expand_ratio

        y = _pw_conv(mid_chs, self.dtype, "conv_pw")(x)
        y = nn.BatchNorm(use_running_average=not train, epsilon=_BN_EPS_TF,
                         momentum=0.99, name="bn1", dtype=jnp.float32)(y)
        y = nn.silu(y.astype(self.dtype))

        y = _dw_conv(self.kernel, self.stride, self.dtype, mid_chs)(y)
        y = nn.BatchNorm(use_running_average=not train, epsilon=_BN_EPS_TF,
                         momentum=0.99, name="bn2", dtype=jnp.float32)(y)
        y = nn.silu(y.astype(self.dtype))

        y = SqueezeExcite(self.se_reduced_chs, dtype=self.dtype, name="se")(y)

        y = _pw_conv(self.out_chs, self.dtype, "conv_pwl")(y)
        y = nn.BatchNorm(use_running_average=not train, epsilon=_BN_EPS_TF,
                         momentum=0.99, name="bn3", dtype=jnp.float32)(y).astype(self.dtype)

        if self.stride == 1 and in_chs == self.out_chs:
            rng = self.make_rng("drop_path") if train and self.drop_path_rate > 0 else None
            y = _drop_path(y, self.drop_path_rate, not train, rng) + shortcut
        return y


def _pick_pack(c: int, w: int) -> int:
    """Largest W-pack factor keeping p*C within one 128-lane tile."""
    for p in (8, 4, 2):
        if p * c <= 128 and w % p == 0:
            return p
    return 1


def pack_w(x, p: int):
    """(B,H,W,C) -> (B,H,W/p,p*C): p consecutive W pixels ride the lane dim
    (g-major: lane = g*C + c). A pure reshape — XLA lowers it to one retile."""
    b, h, w, c = x.shape
    return x.reshape(b, h, w // p, p * c)


def unpack_w(x, c: int):
    b, h, wp, pc = x.shape
    return x.reshape(b, h, wp * (pc // c), c)


def dw_dense_weight(kernel, p: int):
    """(3,3,1,C) depthwise kernel -> (3,3,p*C,p*C) dense HWIO conv weight
    that computes the SAME depthwise conv on the packed layout. Output lane
    (g_out,c) tap dj reads input lane ((g_out+dj-1)%p, c) at packed-col
    offset floor((g_out+dj-1)/p); all other entries are zero. With (1,1)
    padding on the packed col axis this reproduces TF-SAME stride-1 K=3
    exactly (the only reachable pad lanes are the original w=-1 / w=W).
    The 4x-redundant MXU FLOPs are free at stage-0 sizes; the win is full
    128-lane density on the dominant HBM traffic."""
    c = kernel.shape[-1]
    wd = jnp.zeros((kernel.shape[0], 3, p * c, p * c), kernel.dtype)
    ar = jnp.arange(c)
    for dj in range(3):
        for g_out in range(p):
            s = g_out + dj - 1
            g_in, o = s % p, s // p
            wd = wd.at[:, o + 1, g_in * c + ar, g_out * c + ar].set(
                kernel[:, dj, 0, :])
    return wd


class PackedBatchNorm(nn.Module):
    """flax-BatchNorm-equivalent on a W-packed tensor (.., p*C): per-lane
    moments are folded across the p lane groups (exact — every group covers
    the same number of elements), canonical (C,) params and running stats so
    checkpoints are interchangeable with nn.BatchNorm."""
    features: int
    pack: int
    use_running_average: bool
    momentum: float = 0.99
    epsilon: float = _BN_EPS_TF

    @nn.compact
    def __call__(self, x):
        c, p = self.features, self.pack
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(c, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(c, jnp.float32))
        xf = x.astype(jnp.float32)
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            m = jnp.mean(xf, axis=(0, 1, 2))
            m2 = jnp.mean(jnp.square(xf), axis=(0, 1, 2))
            mean = jnp.mean(m.reshape(p, c), axis=0)
            var = jnp.mean(m2.reshape(p, c), axis=0) - jnp.square(mean)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        return (xf - jnp.tile(mean, p)) * jnp.tile(inv, p) + jnp.tile(bias, p)


class _KernelParam(nn.Module):
    """Bare conv-kernel param holder (no bias); name/shape/init match
    nn.Conv(use_bias=False) so checkpoints are interchangeable with the
    unpacked lowering (the same trick as unet_adaptive_bins._ConvOutParams)."""
    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(), self.shape)


class PackedSqueezeExcite(nn.Module):
    """SE gates computed from a W-packed tensor: per-lane spatial means are
    folded across the p lane groups (exact — equal counts) to the canonical
    (B,1,1,C) squeeze, then the usual reduce/expand 1x1 convs (identical
    param tree to SqueezeExcite). Returns sigmoid gates tiled back to p*C
    lanes; the caller multiplies."""
    reduced_chs: int
    features: int
    pack: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xp):
        c, p = self.features, self.pack
        s = jnp.mean(xp.astype(jnp.float32), axis=(1, 2), keepdims=True)
        s = jnp.mean(s.reshape(s.shape[0], 1, 1, p, c), axis=3).astype(self.dtype)
        g = nn.Conv(self.reduced_chs, (1, 1), name="conv_reduce",
                    dtype=self.dtype)(s)
        g = nn.silu(g)
        g = nn.Conv(c, (1, 1), name="conv_expand", dtype=self.dtype)(g)
        g = nn.sigmoid(g)
        return jnp.tile(g, (1, 1, 1, p))


class PackedStemConv(nn.Module):
    """The stride-2 K=3 stem conv emitting the W-packed layout directly:
    output packed col t, lane (g,c) = original w_out = p*t+g, so the conv
    becomes kernel (3, 2p+1) stride (2, 2p) with the canonical (3,3,Cin,C)
    kernel scattered over the p lane groups. Same sums as the native
    TF-SAME stem conv (even W: pad (0,1)); param tree identical to
    nn.Conv(name='conv_stem', use_bias=False)."""
    out_chs: int
    pack: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin, c, p = x.shape[-1], self.out_chs, self.pack
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, cin, c))
        kd = kernel.astype(self.dtype)
        wd = jnp.zeros((3, 2 * p + 1, cin, p * c), self.dtype)
        for g in range(p):
            for dj in range(3):
                wd = wd.at[:, 2 * g + dj, :, g * c:(g + 1) * c].set(kd[:, dj])
        pad_h = jax.lax.padtype_to_pads(x.shape[1:2], (3,), (2,), "SAME")[0]
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), wd, (2, 2 * p), (pad_h, (0, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class PackedDSBlock(nn.Module):
    """DepthwiseSeparableBlock computed in the W-packed lane layout.

    Identical param tree (conv_dw/bn1/se/conv_pw/bn2, canonical shapes) to
    DepthwiseSeparableBlock, so checkpoints and converters are untouched;
    only the schedule differs: every elementwise/BN/SE/pw op runs at full
    lane density instead of C/128, and the depthwise conv becomes an
    equivalent dense conv on the MXU (see dw_dense_weight). Input and
    output are packed: (B,H,W/p,p*C_in) -> (B,H,W/p,p*C_out). Stride-1
    K=3 only (stage-0 blocks)."""
    out_chs: int
    kernel: int
    stride: int
    se_reduced_chs: int
    drop_path_rate: float = 0.0
    dtype: Any = jnp.float32
    pack: int = 4

    @nn.compact
    def __call__(self, xp, train: bool = False):
        assert self.stride == 1 and self.kernel == 3
        p = self.pack
        in_chs = xp.shape[-1] // p
        shortcut = xp
        dw_k = _KernelParam((3, 3, 1, in_chs), name="conv_dw")()
        wd = dw_dense_weight(dw_k.astype(self.dtype), p)
        y = jax.lax.conv_general_dilated(
            xp.astype(self.dtype), wd, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = PackedBatchNorm(in_chs, p, not train, name="bn1")(y)
        y = nn.silu(y.astype(self.dtype))
        y = y * PackedSqueezeExcite(self.se_reduced_chs, in_chs, p,
                                    dtype=self.dtype, name="se")(y)
        pw_k = _KernelParam((1, 1, in_chs, self.out_chs), name="conv_pw")()
        wpd = jnp.kron(jnp.eye(p, dtype=self.dtype),
                       pw_k[0, 0].astype(self.dtype))
        y = y @ wpd
        y = PackedBatchNorm(self.out_chs, p, not train,
                            name="bn2")(y).astype(self.dtype)
        if self.stride == 1 and in_chs == self.out_chs:
            rng = self.make_rng("drop_path") if train and self.drop_path_rate > 0 else None
            y = _drop_path(y, self.drop_path_rate, not train, rng) + shortcut
        return y


class EfficientNetEncoder(nn.Module):
    """EfficientNet trunk returning the full intermediate-feature list.

    in_chs is implicit (taken from the input); when cue channels are inserted
    at the network input (reference unet_adaptive_bins.py:333-354 widens
    conv_stem), the stem here simply sees more channels — the converted
    pretrained RGB kernel slots into channels 0:3 at load time.
    """
    arch: str = "efficientnet-b1"
    # The reference loads the hub model with no kwargs
    # (unet_adaptive_bins.py:324), and gen-efficientnet's builders default
    # drop_connect_rate to 0 — reference training runs WITHOUT stochastic
    # depth, so 0 is the parity default. Set >0 to enable the per-block
    # linearly-scaled drop-path schedule (the EfficientNet-paper recipe).
    drop_path_rate: float = 0.0
    remat: bool = False
    dtype: Any = jnp.float32
    # "packed" computes the high-res low-channel stage-0 blocks in the
    # W-packed lane layout (see PackedDSBlock) — same params, same math,
    # ~full lane density instead of C/128 on the dominant HBM traffic.
    # A "packed2" variant (stage-1 MBConvs packed too, PackedIRBlock) was
    # built and RETIRED in r5: measured 7-15% in-step LOSS (bs16 121.2 vs
    # 112.99 ms, bs32 242.65 vs 223.55, B5 bs8 108.2 vs 94.14; stamps
    # 103-112) — the unpack->dw->repack relayouts of the 4x-expanded
    # stage-1 tensor cost more than packed pw/BN/SE saves. Stage 0 keeps
    # the win because p*C<=128 keeps the dw dense in-layout, no relayout.
    hires_impl: str = "native"     # "native" | "packed"

    @nn.compact
    def __call__(self, x, train: bool = False) -> Sequence[jnp.ndarray]:
        # activation checkpointing (the reference's use_checkpoint capability,
        # Swin-Transformer-Object-Detection swin_transformer.py:393): recompute
        # each block in the backward instead of keeping its activations in HBM
        ds_cls, ir_cls = DepthwiseSeparableBlock, InvertedResidualBlock
        if self.remat:
            ds_cls = nn.remat(DepthwiseSeparableBlock, static_argnums=(2,))
            ir_cls = nn.remat(InvertedResidualBlock, static_argnums=(2,))
        width, depth = EFFICIENTNET_CONFIGS[self.arch]
        stem_chs = round_channels(32, width)
        head_chs = round_channels(1280, width)

        features = [x]
        packed = self.hires_impl == "packed"
        stem_packed = (packed and x.shape[2] % 2 == 0
                       and _pick_pack(stem_chs, x.shape[2] // 2) > 1)
        yp = None
        if stem_packed:
            # stem conv + BN + SiLU all at full lane density; the unpacked
            # feature-list views are pure reshapes that XLA dead-code
            # eliminates when (as in the depth model) nothing consumes them
            p = _pick_pack(stem_chs, x.shape[2] // 2)
            yp = PackedStemConv(stem_chs, p, dtype=self.dtype,
                                name="conv_stem")(x)
            features.append(unpack_w(yp, stem_chs))
            yp = PackedBatchNorm(stem_chs, p, not train, name="bn1")(yp)
            features.append(unpack_w(yp, stem_chs))
            yp = nn.silu(yp.astype(self.dtype))
            y = unpack_w(yp, stem_chs)
            features.append(y)
        else:
            y = nn.Conv(stem_chs, (3, 3), strides=2, padding="SAME", use_bias=False,
                        name="conv_stem", dtype=self.dtype)(x.astype(self.dtype))
            features.append(y)
            y = nn.BatchNorm(use_running_average=not train, epsilon=_BN_EPS_TF,
                             momentum=0.99, name="bn1", dtype=jnp.float32)(y)
            features.append(y)
            y = nn.silu(y.astype(self.dtype))
            features.append(y)

        total_blocks = sum(round_repeats(r, depth) for (_, _, _, _, r) in _B0_STAGES)
        block_idx = 0
        for stage_i, (expand, kernel, stride, base_c, base_r) in enumerate(_B0_STAGES):
            out_chs = round_channels(base_c, width)
            repeats = round_repeats(base_r, depth)
            if (packed and stage_i == 0 and expand == 1
                    and stride == 1 and kernel == 3
                    and _pick_pack(y.shape[-1], y.shape[2]) > 1):
                pk_cls = (nn.remat(PackedDSBlock, static_argnums=(2,))
                          if self.remat else PackedDSBlock)
                p = _pick_pack(y.shape[-1], y.shape[2])
                if yp is None:
                    yp = pack_w(y, p)
                for rep in range(repeats):
                    in_chs = yp.shape[-1] // p
                    se_reduced = max(1, int(in_chs * 0.25))
                    dp_rate = self.drop_path_rate * block_idx / total_blocks
                    yp = pk_cls(out_chs, kernel, 1, se_reduced, dp_rate,
                                self.dtype, p,
                                name=f"blocks_{stage_i}_{rep}")(yp, train)
                    block_idx += 1
                    new_p = _pick_pack(out_chs, y.shape[2])
                    if new_p != p:  # denser repack once channels shrink
                        yp = pack_w(unpack_w(yp, out_chs), new_p)
                        p = new_p
                y = unpack_w(yp, out_chs)
                yp = None
                features.append(y)
                continue
            yp = None
            for rep in range(repeats):
                s = stride if rep == 0 else 1
                in_chs = y.shape[-1]
                se_reduced = max(1, int(in_chs * 0.25))
                dp_rate = self.drop_path_rate * block_idx / total_blocks
                name = f"blocks_{stage_i}_{rep}"
                if expand == 1:
                    y = ds_cls(out_chs, kernel, s, se_reduced,
                               dp_rate, self.dtype, name=name)(y, train)
                else:
                    y = ir_cls(out_chs, kernel, s, expand, se_reduced,
                               dp_rate, self.dtype, name=name)(y, train)
                block_idx += 1
            features.append(y)

        y = _pw_conv(head_chs, self.dtype, "conv_head")(y)
        features.append(y)
        y = nn.BatchNorm(use_running_average=not train, epsilon=_BN_EPS_TF,
                         momentum=0.99, name="bn2", dtype=jnp.float32)(y)
        features.append(y)
        y = nn.silu(y.astype(self.dtype))
        features.append(y)
        return features
