"""Residual blocks (reference ``ResidualBlock18``/``ResidualBlock50``,
``modules/residual_blocks.py:10-174``).

``BasicBlock`` = two 3×3 convs + identity/1×1-projection shortcut (ResNet-18).
``BottleneckBlock`` = 1×1 reduce → 3×3 (stride here, v1.5 convention) → 1×1
expand×4 (ResNet-50) — the reference's ``ResidualBlock50`` intent without its
M6 norm-reassignment crash. ``ResNetStage`` stacks blocks, first block carries
the stride (replaces the reference's ``nn.Sequential``-of-blocks ``build``).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from detax.nn.conv import ConvNorm


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    norm: str = "frozen_bn"
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        shortcut = x
        needs_proj = self.strides != 1 or x.shape[-1] != self.features
        if needs_proj:
            shortcut = ConvNorm(
                features=self.features,
                kernel_size=1,
                strides=self.strides,
                norm=self.norm,
                bn_axis_name=self.bn_axis_name,
                dtype=self.dtype,
                name="downsample",
            )(x, train=train)
        y = ConvNorm(
            self.features, 3, self.strides, norm=self.norm, activation=nn.relu,
            bn_axis_name=self.bn_axis_name, dtype=self.dtype, name="conv1",
        )(x, train=train)
        y = ConvNorm(
            self.features, 3, 1, norm=self.norm, activation=None,
            bn_axis_name=self.bn_axis_name, dtype=self.dtype, name="conv2",
        )(y, train=train)
        return nn.relu(y + shortcut)


class BottleneckBlock(nn.Module):
    features: int  # inner (bottleneck) width; output is features * 4
    strides: int = 1
    norm: str = "frozen_bn"
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = self.features * self.expansion
        shortcut = x
        if self.strides != 1 or x.shape[-1] != out_ch:
            shortcut = ConvNorm(
                out_ch, 1, self.strides, norm=self.norm,
                bn_axis_name=self.bn_axis_name, dtype=self.dtype, name="downsample",
            )(x, train=train)
        y = ConvNorm(
            self.features, 1, 1, norm=self.norm, activation=nn.relu,
            bn_axis_name=self.bn_axis_name, dtype=self.dtype, name="conv1",
        )(x, train=train)
        y = ConvNorm(
            self.features, 3, self.strides, norm=self.norm, activation=nn.relu,
            bn_axis_name=self.bn_axis_name, dtype=self.dtype, name="conv2",
        )(y, train=train)
        y = ConvNorm(
            out_ch, 1, 1, norm=self.norm, activation=None,
            bn_axis_name=self.bn_axis_name, dtype=self.dtype, name="conv3",
        )(y, train=train)
        return nn.relu(y + shortcut)


class ResNetStage(nn.Module):
    num_blocks: int
    features: int
    strides: int = 1  # stride of the first block
    bottleneck: bool = False
    norm: str = "frozen_bn"
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        block = BottleneckBlock if self.bottleneck else BasicBlock
        for i in range(self.num_blocks):
            x = block(
                features=self.features,
                strides=self.strides if i == 0 else 1,
                norm=self.norm,
                bn_axis_name=self.bn_axis_name,
                dtype=self.dtype,
                name=f"block{i}",
            )(x, train=train)
        return x
