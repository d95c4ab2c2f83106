"""Keypoint R-CNN head.

Completes the reference's dead keypoint-head slot (``roi.py:341-373``, dead
Detectron2 paste — defect M3). Standard ``KRCNNConvDeconvUpsample`` contract:
8 3×3 convs + 2× deconv + 2× bilinear upsample over 14×14-pooled ROI features
→ 56×56 per-keypoint heatmap logits.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from detax.nn.fpn_blocks import upsample2x_nearest

_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def _upsample2x_bilinear(x: jnp.ndarray) -> jnp.ndarray:
    import jax

    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bilinear")


class KeypointRCNNHead(nn.Module):
    num_keypoints: int = 17
    num_convs: int = 8
    conv_dim: int = 512
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """x: ``(..., ph, pw, C)`` → ``(..., 4*ph, 4*pw, K)`` heatmap logits."""
        lead = x.shape[:-3]
        x = x.reshape((-1,) + x.shape[-3:])
        for i in range(self.num_convs):
            x = nn.relu(
                nn.Conv(self.conv_dim, (3, 3), padding="SAME", kernel_init=_init,
                        dtype=self.dtype, name=f"conv_fcn{i + 1}")(x)
            )
        x = nn.ConvTranspose(
            self.num_keypoints, (4, 4), strides=(2, 2), kernel_init=_init,
            dtype=self.dtype, name="score_lowres",
        )(x)
        x = _upsample2x_bilinear(x.astype(jnp.float32))
        return x.reshape(lead + x.shape[1:])
