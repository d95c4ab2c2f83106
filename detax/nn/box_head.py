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
import jax
import jax.numpy as jnp


class _StructuredDense(nn.Module):
    """``Dense`` over flattened ``(rows, ch)`` input WITHOUT flattening.

    Parameter tree, shapes, and init are identical to
    ``nn.Dense(features)`` on the flattened input, but the contraction runs
    as ``dot_general((N, rows, ch) · (rows, ch, features))``.  The flatten
    of the pooled tensor is a real relayout on TPU — its minor dim is 64
    (half a 128-lane tile), so XLA first compacts ~550 MB of half-empty
    tiles; feeding the 3-D operand straight to the MXU skips that
    (measured 4.62 → 2.42 ms for fc0 at b128 serving shapes)."""

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, rows, ch = x.shape
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (rows * ch, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        dtype = self.dtype or x.dtype
        w = kernel.reshape(rows, ch, self.features).astype(dtype)
        y = jax.lax.dot_general(
            x.astype(dtype), w, (((1, 2), (0, 1)), ((), ()))
        )
        return y + bias.astype(dtype)


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
        if self.num_fc > 0:
            n, ph_, pw_, c_ = x.shape
            x = nn.relu(
                _StructuredDense(self.fc_dim, dtype=self.dtype, name="fc0")(
                    x.reshape(n, ph_ * pw_, c_)
                )
            )
            for i in range(1, self.num_fc):
                x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype, name=f"fc{i}")(x))
        else:
            x = x.reshape(x.shape[0], -1)
        return x.reshape(lead + (x.shape[-1],))


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
