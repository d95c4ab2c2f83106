"""RetinaNet head: shared cls/box towers over FPN levels (BASELINE config 3).

No reference analog (the reference is two-stage only). Standard contract:
``num_convs`` 3×3 convs + ReLU per tower, shared across levels; final 3×3
predictors emit ``A*num_classes`` focal-loss logits and ``A*4`` deltas.
Classification bias initialized to ``-log((1-p)/p)`` (prior_prob) so training
starts with rare-positive calibration.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

_init = nn.initializers.normal(stddev=0.01)


class RetinaNetHead(nn.Module):
    num_classes: int = 80
    num_anchors: int = 9
    num_convs: int = 4
    prior_prob: float = 0.01
    box_dim: int = 4
    # int8 tower quantization: None | "qat" | "int8" (detax.ops.quant).
    # Same param names as nn.Conv, so bf16 checkpoints load into "qat" and
    # export_int8_conv produces the "int8" pytree.
    quant: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, features: List[jnp.ndarray]) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
        channels = features[0].shape[-1]
        if self.quant:
            from detax.ops.quant import QuantConv

            mk = lambda name: QuantConv(
                channels, (3, 3), mode=self.quant, kernel_init=_init,
                dtype=self.dtype, name=name,
            )
        else:
            mk = lambda name: nn.Conv(
                channels, (3, 3), padding="SAME", kernel_init=_init, dtype=self.dtype,
                name=name,
            )
        cls_tower = [mk(f"cls_conv{i}") for i in range(self.num_convs)]
        box_tower = [mk(f"box_conv{i}") for i in range(self.num_convs)]
        bias_init = nn.initializers.constant(-math.log((1 - self.prior_prob) / self.prior_prob))
        cls_pred = nn.Conv(
            self.num_anchors * self.num_classes, (3, 3), padding="SAME",
            kernel_init=_init, bias_init=bias_init, dtype=self.dtype, name="cls_score",
        )
        box_pred = nn.Conv(
            self.num_anchors * self.box_dim, (3, 3), padding="SAME",
            kernel_init=_init, dtype=self.dtype, name="bbox_pred",
        )
        logits_out, deltas_out = [], []
        for x in features:
            c = x
            for conv in cls_tower:
                c = nn.relu(conv(c))
            b = x
            for conv in box_tower:
                b = nn.relu(conv(b))
            n, h, w, _ = x.shape
            # compute-dtype outputs: the f32 widening of the (B, HWA, 80)
            # logit maps cost ~1.2 GB of extra traffic at 640²/b64 and is
            # value-lossless to defer (bf16→f32 exact; selection order and
            # the post-gather f32 decode/sigmoid see identical numbers) —
            # the loss path casts its flattened operands up instead
            lg = cls_pred(c).reshape(n, h * w * self.num_anchors, self.num_classes)
            dl = box_pred(b).reshape(n, h * w * self.num_anchors, self.box_dim)
            logits_out.append(lg)
            deltas_out.append(dl)
        return logits_out, deltas_out
