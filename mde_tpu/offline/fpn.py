"""FPN neck (mmdet FPN semantics: lateral 1x1 + top-down nearest upsample +
3x3 output convs, P6 = stride-2 max-pool of P5; num_outs=5 —
Swin-Transformer-Object-Detection/configs/_base_/models/cascade_…ade20k.py:24-28)."""

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops.resize import resize_nearest


class FPN(nn.Module):
    out_channels: int = 256
    num_outs: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        n_in = len(inputs)
        laterals = [nn.Conv(self.out_channels, (1, 1), name=f"lateral{i}",
                            dtype=self.dtype)(x.astype(self.dtype))
                    for i, x in enumerate(inputs)]
        for i in range(n_in - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + resize_nearest(
                laterals[i], laterals[i - 1].shape[1:3])
        outs = [nn.Conv(self.out_channels, (3, 3), padding=1, name=f"fpn{i}",
                        dtype=self.dtype)(laterals[i]) for i in range(n_in)]
        if self.num_outs > n_in:
            # P6: stride-2 1x1 max pool of P5 (mmdet default extra level)
            p6 = nn.max_pool(outs[-1], (1, 1), strides=(2, 2))
            outs.append(p6)
        return outs
