"""Fast R-CNN box head + output layers.

Completes the reference's dead ``FastRCNNConvFCHead``
(``modules/roi_head.py:9-83``, defect M4: undefined attrs, cannot construct)
and the never-built ``box_predictor`` (defect M3/M5) with the standard
Detectron2-style head: optional 3×3 conv stack, then FC stack, then two
linear predictors — class scores over ``num_classes + 1`` (background last)
and per-class box deltas.

Init parity with Detectron2: conv/fc ~ (caffe2) MSRA/Xavier; predictors
cls ~ Normal(0.01), box ~ Normal(0.001), zero bias.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp


class FastRCNNConvFCHead(nn.Module):
    num_conv: int = 0
    conv_dim: int = 256
    num_fc: int = 2
    fc_dim: int = 1024
    norm: str = ""
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """x: ``(..., ph, pw, C)`` pooled features → ``(..., fc_dim)``."""
        from detax.nn.conv import ConvNorm

        lead = x.shape[:-3]
        x = x.reshape((-1,) + x.shape[-3:])
        for i in range(self.num_conv):
            x = ConvNorm(
                self.conv_dim, 3, 1, norm=self.norm, activation=nn.relu,
                dtype=self.dtype, name=f"conv{i}",
            )(x, train=train)
        x = x.reshape(x.shape[0], -1)
        for i in range(self.num_fc):
            x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype, name=f"fc{i}")(x))
        return x.reshape(lead + (self.fc_dim,))


class FastRCNNOutputLayers(nn.Module):
    num_classes: int = 80
    box_dim: int = 4
    cls_agnostic_bbox_reg: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: ``(..., D)`` → scores ``(..., C+1)``, deltas ``(..., K, 4)``."""
        scores = nn.Dense(
            self.num_classes + 1,
            kernel_init=nn.initializers.normal(0.01),
            dtype=self.dtype,
            name="cls_score",
        )(x).astype(jnp.float32)
        k = 1 if self.cls_agnostic_bbox_reg else self.num_classes
        deltas = nn.Dense(
            k * self.box_dim,
            kernel_init=nn.initializers.normal(0.001),
            dtype=self.dtype,
            name="bbox_pred",
        )(x).astype(jnp.float32)
        return scores, deltas.reshape(deltas.shape[:-1] + (k, self.box_dim))
