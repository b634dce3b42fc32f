"""Semantic-segmentation model zoo — the capability of the CSAILVision
ModelBuilder factory (semantic-segmentation-pytorch/mit_semseg/models/models.py:51-160):
encoders (resnet18/50/101 with optional dilation, resnext101,
mobilenetv2-dilated, hrnetv2) and decoders (c1, c1_deepsup, ppm,
ppm_deepsup, upernet).

The cue pipeline uses hrnetv2+c1 (offline/hrnet.py); this zoo rounds out the
toolkit so any reference config maps to a flax model. All NHWC, BN inference/
train via batch_stats, interpolations through the framework's matmul resizes.
"""

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.resize import resize_bilinear_half_pixel
from .hrnet import HRNetV2Trunk, _bn


class ResNetBlock(nn.Module):
    """Bottleneck (expansion 4) or basic (expansion 1) residual block with
    optional dilation (the 'dilated8' trick replaces stride by dilation).
    groups>1 + expansion=2 gives the CSAIL GroupBottleneck
    (mit_semseg/models/resnext.py:23-59) used by resnext101."""
    planes: int
    stride: int = 1
    dilation: int = 1
    bottleneck: bool = True
    has_downsample: bool = False
    dtype: Any = jnp.float32
    groups: int = 1
    expansion: int = 0  # 0 = derive from bottleneck (4) / basic (1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        expansion = self.expansion or (4 if self.bottleneck else 1)
        out_ch = self.planes * expansion
        residual = x
        if self.bottleneck:
            y = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1",
                        dtype=self.dtype)(x)
            y = nn.relu(_bn(train, "bn1")(y).astype(self.dtype))
            y = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=self.dilation,
                        kernel_dilation=self.dilation, use_bias=False, name="conv2",
                        feature_group_count=self.groups,
                        dtype=self.dtype)(y)
            y = nn.relu(_bn(train, "bn2")(y).astype(self.dtype))
            y = nn.Conv(out_ch, (1, 1), use_bias=False, name="conv3", dtype=self.dtype)(y)
            y = _bn(train, "bn3")(y).astype(self.dtype)
        else:
            y = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=self.dilation,
                        kernel_dilation=self.dilation, use_bias=False, name="conv1",
                        dtype=self.dtype)(x)
            y = nn.relu(_bn(train, "bn1")(y).astype(self.dtype))
            y = nn.Conv(self.planes, (3, 3), padding=self.dilation,
                        kernel_dilation=self.dilation, use_bias=False, name="conv2",
                        dtype=self.dtype)(y)
            y = _bn(train, "bn2")(y).astype(self.dtype)
        if self.has_downsample:
            residual = nn.Conv(out_ch, (1, 1), strides=self.stride, use_bias=False,
                               name="downsample_conv", dtype=self.dtype)(x)
            residual = _bn(train, "downsample_bn")(residual).astype(self.dtype)
        return nn.relu(y + residual)


_RESNET_LAYERS = {"resnet18": (2, 2, 2, 2), "resnet50": (3, 4, 6, 3),
                  "resnet101": (3, 4, 23, 3), "resnext101": (3, 4, 23, 3)}


class ResNetEncoder(nn.Module):
    """CSAIL-style ResNet trunk (deep 3x3x3 stem) returning conv2..conv5
    feature maps; dilated=True converts stages 3/4 to dilation 2/4
    (stride-8 output) as in resnet50dilated/resnet101dilated."""
    arch: str = "resnet50"
    dilated: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        layers = _RESNET_LAYERS[self.arch]
        bottleneck = self.arch != "resnet18"
        is_next = self.arch == "resnext101"
        groups = 32 if is_next else 1
        expansion = 2 if is_next else (4 if bottleneck else 1)
        y = x.astype(self.dtype)
        for i, ch in enumerate((64, 64, 128)):
            y = nn.Conv(ch, (3, 3), strides=2 if i == 0 else 1, padding=1,
                        use_bias=False, name=f"stem_conv{i + 1}", dtype=self.dtype)(y)
            y = nn.relu(_bn(train, f"stem_bn{i + 1}")(y).astype(self.dtype))
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        planes = (128, 256, 512, 1024) if is_next else (64, 128, 256, 512)
        for stage in range(4):
            if self.dilated and stage >= 2:
                stride, dilation = 1, 2 ** (stage - 1)
            else:
                stride, dilation = (1 if stage == 0 else 2), 1
            for b in range(layers[stage]):
                needs_ds = b == 0 and (stride != 1 or
                                       y.shape[-1] != planes[stage] * expansion)
                y = ResNetBlock(planes[stage], stride if b == 0 else 1, dilation,
                                bottleneck, needs_ds, self.dtype, groups, expansion,
                                name=f"layer{stage + 1}_block{b}")(y, train)
            outs.append(y)
        return outs


class MobileNetV2Block(nn.Module):
    expand: int
    out_ch: int
    stride: int
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        mid = in_ch * self.expand
        y = x
        if self.expand != 1:
            y = nn.Conv(mid, (1, 1), use_bias=False, name="pw", dtype=self.dtype)(y)
            y = nn.relu6(_bn(train, "pw_bn")(y).astype(self.dtype))
        y = nn.Conv(mid, (3, 3), strides=self.stride, padding=self.dilation,
                    kernel_dilation=self.dilation, feature_group_count=mid,
                    use_bias=False, name="dw", dtype=self.dtype)(y)
        y = nn.relu6(_bn(train, "dw_bn")(y).astype(self.dtype))
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False, name="pwl", dtype=self.dtype)(y)
        y = _bn(train, "pwl_bn")(y).astype(self.dtype)
        if self.stride == 1 and in_ch == self.out_ch:
            y = y + x
        return y


class MobileNetV2Dilated(nn.Module):
    """mobilenetv2dilated encoder (stride-8, last stages dilated)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = [  # (expand, out, repeats, stride)
            (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
            (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]
        y = nn.Conv(32, (3, 3), strides=2, padding=1, use_bias=False,
                    name="stem", dtype=self.dtype)(x.astype(self.dtype))
        y = nn.relu6(_bn(train, "stem_bn")(y).astype(self.dtype))
        dilation = 1
        for si, (e, c, r, s) in enumerate(cfg):
            for b in range(r):
                stride = s if b == 0 else 1
                if si >= 3 and stride == 2:  # dilate instead of stride past 1/8
                    stride = 1
                    dilation *= 2
                y = MobileNetV2Block(e, c, stride, dilation, self.dtype,
                                     name=f"block{si}_{b}")(y, train)
        return [y]


class PPMDecoder(nn.Module):
    """Pyramid pooling decoder (models.py ppm / ppm_deepsup)."""
    num_classes: int = 150
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, conv_out, seg_size=None, train: bool = False):
        x = conv_out[-1]
        h, w = x.shape[1:3]
        feats = [x]
        for i, scale in enumerate(self.pool_scales):
            p = _adaptive_avg_pool(x, scale)
            p = nn.Conv(512, (1, 1), use_bias=False, name=f"pool{i}_conv",
                        dtype=self.dtype)(p)
            p = nn.relu(_bn(train, f"pool{i}_bn")(p).astype(self.dtype))
            feats.append(resize_bilinear_half_pixel(p, (h, w)))
        y = jnp.concatenate(feats, axis=-1)
        y = nn.Conv(512, (3, 3), padding=1, use_bias=False, name="fusion_conv",
                    dtype=self.dtype)(y)
        y = nn.relu(_bn(train, "fusion_bn")(y).astype(self.dtype))
        y = nn.Conv(self.num_classes, (1, 1), name="conv_last", dtype=self.dtype)(y)
        y = y.astype(jnp.float32)
        if seg_size is not None:
            y = resize_bilinear_half_pixel(y, seg_size)
            return jax.nn.softmax(y, axis=-1)
        return jax.nn.log_softmax(y, axis=-1)


def _adaptive_avg_pool(x, out: int):
    """torch AdaptiveAvgPool2d to (out, out): window i spans
    [floor(i*h/out), ceil((i+1)*h/out))."""
    import math
    n, h, w, c = x.shape
    rows = []
    for i in range(out):
        y0, y1 = (i * h) // out, math.ceil((i + 1) * h / out)
        cols = []
        for j in range(out):
            x0, x1 = (j * w) // out, math.ceil((j + 1) * w / out)
            cols.append(jnp.mean(x[:, y0:y1, x0:x1], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)          # (N, out, out, C)


class UPerNetDecoder(nn.Module):
    """UPerNet decoder: PPM on the last level + FPN fusion over conv2..conv5."""
    num_classes: int = 150
    fpn_dim: int = 512
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, conv_out, seg_size=None, train: bool = False):
        c5 = conv_out[-1]
        h5, w5 = c5.shape[1:3]
        ppm_feats = [c5]
        for i, scale in enumerate(self.pool_scales):
            p = _adaptive_avg_pool(c5, scale)
            p = nn.Conv(self.fpn_dim, (1, 1), use_bias=False, name=f"ppm{i}_conv",
                        dtype=self.dtype)(p)
            p = nn.relu(_bn(train, f"ppm{i}_bn")(p).astype(self.dtype))
            ppm_feats.append(resize_bilinear_half_pixel(p, (h5, w5)))
        f = jnp.concatenate(ppm_feats, axis=-1)
        f = nn.Conv(self.fpn_dim, (3, 3), padding=1, use_bias=False,
                    name="ppm_last_conv", dtype=self.dtype)(f)
        f = nn.relu(_bn(train, "ppm_last_bn")(f).astype(self.dtype))

        laterals = []
        for i, c in enumerate(conv_out[:-1]):
            l = nn.Conv(self.fpn_dim, (1, 1), use_bias=False, name=f"lat{i}_conv",
                        dtype=self.dtype)(c)
            laterals.append(nn.relu(_bn(train, f"lat{i}_bn")(l).astype(self.dtype)))
        laterals.append(f)

        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + resize_bilinear_half_pixel(
                laterals[i], laterals[i - 1].shape[1:3])

        outs = []
        target_hw = laterals[0].shape[1:3]
        for i, l in enumerate(laterals):
            o = nn.Conv(self.fpn_dim, (3, 3), padding=1, use_bias=False,
                        name=f"fpn_out{i}_conv", dtype=self.dtype)(l)
            o = nn.relu(_bn(train, f"fpn_out{i}_bn")(o).astype(self.dtype))
            outs.append(resize_bilinear_half_pixel(o, target_hw))
        y = jnp.concatenate(outs, axis=-1)
        y = nn.Conv(self.fpn_dim, (3, 3), padding=1, use_bias=False,
                    name="fusion_conv", dtype=self.dtype)(y)
        y = nn.relu(_bn(train, "fusion_bn")(y).astype(self.dtype))
        y = nn.Conv(self.num_classes, (1, 1), name="conv_last", dtype=self.dtype)(y)
        y = y.astype(jnp.float32)
        if seg_size is not None:
            y = resize_bilinear_half_pixel(y, seg_size)
            return jax.nn.softmax(y, axis=-1)
        return jax.nn.log_softmax(y, axis=-1)


class SegmentationModel(nn.Module):
    """encoder + decoder wrapper — the SegmentationModule / ModelBuilder
    surface (models.py:22-160)."""
    arch_encoder: str = "hrnetv2"
    arch_decoder: str = "c1"
    num_classes: int = 150
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, seg_size=None, train: bool = False):
        enc = self.arch_encoder
        if enc == "hrnetv2":
            feats = [HRNetV2Trunk(self.dtype, name="encoder")(x, train)]
        elif enc.startswith("resnet") or enc == "resnext101":
            # resnext101 has no dilated ModelBuilder variant (models.py:96-98)
            feats = ResNetEncoder(enc.replace("dilated", ""),
                                  dilated="dilated" in enc, dtype=self.dtype,
                                  name="encoder")(x, train)
        elif enc == "mobilenetv2dilated":
            feats = MobileNetV2Dilated(self.dtype, name="encoder")(x, train)
        else:
            raise ValueError(f"unknown encoder {enc}")

        dec = self.arch_decoder
        if dec.startswith("c1"):
            fc_dim = feats[-1].shape[-1]
            y = nn.Conv(fc_dim // 4, (3, 3), padding=1, use_bias=False,
                        name="cbr_conv", dtype=self.dtype)(feats[-1])
            y = nn.relu(_bn(train, "cbr_bn")(y).astype(self.dtype))
            y = nn.Conv(self.num_classes, (1, 1), name="conv_last",
                        dtype=self.dtype)(y).astype(jnp.float32)
            if seg_size is not None:
                y = resize_bilinear_half_pixel(y, seg_size)
                return jax.nn.softmax(y, axis=-1)
            return jax.nn.log_softmax(y, axis=-1)
        if dec.startswith("ppm"):
            return PPMDecoder(self.num_classes, dtype=self.dtype,
                              name="decoder")(feats, seg_size, train)
        if dec == "upernet":
            return UPerNetDecoder(self.num_classes, dtype=self.dtype,
                                  name="decoder")(feats, seg_size, train)
        raise ValueError(f"unknown decoder {dec}")
