"""UNet decoder over EfficientNet skips (reference unet_adaptive_bins.py:39-100).

NHWC, bilinear align_corners=True upsampling expressed as MXU matmuls
(ops/resize.py), LeakyReLU(0.01) after each BN as in torch defaults. The
reference's conv2 quirk — a 1x1 conv declared with padding=1, which grows the
bottleneck map by a 2-pixel border (unet_adaptive_bins.py:61) — is reproduced
faithfully: the border is resized away by the first upsample, but keeping it
preserves numerical parity with converted checkpoints.
"""

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops.resize import resize_bilinear_align_corners

_BN_EPS = 1e-5  # torch nn.BatchNorm2d default


class UpSampleBN(nn.Module):
    """Upsample-to-skip-size, concat, then (conv3x3 BN LeakyReLU) x2
    (reference unet_adaptive_bins.py:39-53).

    A fused Pallas lowering of [resize -> concat -> conv_a]
    (kernels/up_block.py, '--up_impl fused') was built and RETIRED in r5
    (README "Measured experiments"): in-step bs16 138.71 ms fused vs
    113.13 native, +23% (stamp 111.3) — XLA's producer-epilogue fusion
    over the resize+concat+conv chain beats the hand round-trip through
    VMEM row-tiles."""
    output_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, concat_with, train: bool = False):
        up_x = resize_bilinear_align_corners(x, concat_with.shape[-3:-1])
        f = jnp.concatenate([up_x, concat_with.astype(self.dtype)], axis=-1)
        y = nn.Conv(self.output_features, (3, 3), padding=1, name="conv_a",
                    dtype=self.dtype)(f)
        y = nn.BatchNorm(use_running_average=not train, epsilon=_BN_EPS,
                         momentum=0.9, name="bn_a", dtype=jnp.float32)(y)
        y = nn.leaky_relu(y.astype(self.dtype), 0.01)
        y = nn.Conv(self.output_features, (3, 3), padding=1, name="conv_b",
                    dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, epsilon=_BN_EPS,
                         momentum=0.9, name="bn_b", dtype=jnp.float32)(y)
        y = nn.leaky_relu(y.astype(self.dtype), 0.01)
        return y


class DecoderBN(nn.Module):
    """4-stage UNet decoder (reference unet_adaptive_bins.py:56-100).

    Consumes the encoder feature list; skip connections use
    features[8], [6], [5], [4] and the bottleneck features[11].
    """
    num_features: int = 1280       # 1280 for B1, 2048 for B5
    num_classes: int = 128
    mode: str = "AdaBins"          # "AdaBins" -> num_classes out; "noAdaBins" -> 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, train: bool = False):
        x_block0, x_block1, x_block2, x_block3, x_block4 = (
            features[4], features[5], features[6], features[8], features[11])
        f = self.num_features

        # reference conv2: 1x1 kernel with padding=1 grows H,W by 2.
        x = jnp.pad(x_block4.astype(self.dtype), ((0, 0), (1, 1), (1, 1), (0, 0)))
        x_d0 = nn.Conv(f, (1, 1), name="conv2", dtype=self.dtype)(x)

        x_d1 = UpSampleBN(f // 2, self.dtype, name="up1")(x_d0, x_block3, train)
        x_d2 = UpSampleBN(f // 4, self.dtype, name="up2")(x_d1, x_block2, train)
        x_d3 = UpSampleBN(f // 8, self.dtype, name="up3")(x_d2, x_block1, train)
        x_d4 = UpSampleBN(f // 16, self.dtype, name="up4")(x_d3, x_block0, train)

        out_ch = 1 if self.mode == "noAdaBins" else self.num_classes
        out = nn.Conv(out_ch, (3, 3), padding=1, name="conv3", dtype=self.dtype)(x_d4)
        return out
