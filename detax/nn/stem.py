"""ResNet stem (reference ``BasicStem``, ``modules/residual_blocks.py:176-224``).

7×7 stride-2 conv + norm + ReLU + 3×3 stride-2 max-pool → overall stride 4.
NHWC; padding matches torch's (3 for the conv, 1 for the pool) so imported
torchvision weights reproduce activations exactly.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from detax.nn.conv import ConvNorm


class BasicStem(nn.Module):
    out_channels: int = 64
    norm: str = "frozen_bn"
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvNorm(
            features=self.out_channels,
            kernel_size=7,
            strides=2,
            norm=self.norm,
            activation=nn.relu,
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
            name="stem_conv",
        )(x, train=train)
        x = nn.max_pool(x, window_shape=(3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        return x
