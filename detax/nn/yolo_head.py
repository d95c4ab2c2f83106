"""YOLO-style multi-scale anchor head (BASELINE config 4).

No reference analog. Per stride level: a small conv neck (1×1 reduce + 3×3)
then a 1×1 predictor emitting ``A * (5 + num_classes)`` channels per cell
(tx, ty, tw, th, objectness, class logits). Decoding follows the classic
YOLOv3 box parameterization:

  cx = (sigmoid(tx) + grid_x) * stride      w = anchor_w * exp(tw)
  cy = (sigmoid(ty) + grid_y) * stride      h = anchor_h * exp(th)
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

_init = nn.initializers.normal(stddev=0.01)


class YOLOHead(nn.Module):
    num_classes: int = 80
    num_anchors: int = 3
    hidden_dim: int = 256
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, features: List[jnp.ndarray]) -> List[jnp.ndarray]:
        """per-level NHWC → per-level ``(N, Hi*Wi*A, 5 + num_classes)`` raw
        predictions (pre-sigmoid/exp — decoding happens in the model)."""
        out = []
        pred_ch = self.num_anchors * (5 + self.num_classes)
        for i, x in enumerate(features):
            y = nn.relu(nn.Conv(self.hidden_dim // 2, (1, 1), kernel_init=_init,
                                dtype=self.dtype, name=f"reduce{i}")(x))
            y = nn.relu(nn.Conv(self.hidden_dim, (3, 3), padding="SAME", kernel_init=_init,
                                dtype=self.dtype, name=f"conv{i}")(y))
            p = nn.Conv(pred_ch, (1, 1), kernel_init=_init, dtype=self.dtype, name=f"pred{i}")(y)
            n, h, w, _ = p.shape
            # raw stays in the compute dtype: widening to f32 at full map
            # resolution cost ~8 ms/batch of relayout+copy traffic at 640²
            # b128 (HLO audit) — consumers cast their (small) selections up
            out.append(p.reshape(n, h * w * self.num_anchors, 5 + self.num_classes))
        return out
