"""FPN building blocks (reference ``modules/fpn_blocks.py:11-128``).

``FPNTopDown``: lateral 1×1 conv + nearest ×2 upsample-add + output 3×3 conv,
returning ``(output, merged)`` exactly like the reference top-down block.
``LastLevelMaxPool``: stride-2 kernel-1 max pool producing the extra coarsest
level (reference P5-from-P4, ``fpn_blocks.py:32-41``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from detax.nn.conv import ConvNorm


def upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor ×2 upsample, NHWC (torch ``F.interpolate`` parity)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class FPNTopDown(nn.Module):
    out_channels: int = 64
    norm: str = ""
    fuse_type: str = "sum"  # sum | avg (reference fpn.py fuse_type, fpn.py:41)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self, lateral_in: jnp.ndarray, top_down: Optional[jnp.ndarray], train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        lateral = ConvNorm(
            self.out_channels, 1, 1, norm=self.norm, dtype=self.dtype, name="lateral"
        )(lateral_in, train=train)
        if top_down is not None:
            merged = lateral + upsample2x_nearest(top_down)
            if self.fuse_type == "avg":
                merged = merged / 2.0
        else:
            merged = lateral
        out = ConvNorm(
            self.out_channels, 3, 1, norm=self.norm, dtype=self.dtype, name="output"
        )(merged, train=train)
        return out, merged


class LastLevelMaxPool(nn.Module):
    """Extra coarsest level: 1×1-kernel stride-2 max pool (= subsample)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.max_pool(x, window_shape=(1, 1), strides=(2, 2))
