"""RPN head (reference ``RPNHead``, ``modules/rpn_heads.py:9-121``).

Shared 3×3 conv(+ReLU) stack, then two sibling 1×1 convs: objectness logits
(A channels) and anchor deltas (A·4 channels), applied per FPN level with
shared parameters. Outputs are reshaped NHWC → ``(N, H*W*A, ·)`` here so the
downstream proposal machinery never sees layout (the reference does this with
einops ``rearrange`` at ``rpn.py:270-284``).

Init parity: conv weights ~ Normal(0, 0.01), zero bias (``rpn_heads.py:102-112``).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

_init = nn.initializers.normal(stddev=0.01)


class RPNHead(nn.Module):
    num_anchors: int = 3
    conv_dims: Sequence[int] = (64,)
    box_dim: int = 4
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, features: List[jnp.ndarray]):
        """features: per-level NHWC maps → (logits, deltas) per level,
        flattened to ``(N, Hi*Wi*A)`` / ``(N, Hi*Wi*A, box_dim)``."""
        convs = [
            nn.Conv(d, (3, 3), padding="SAME", kernel_init=_init, dtype=self.dtype, name=f"conv{i}")
            for i, d in enumerate(self.conv_dims)
        ]
        obj = nn.Conv(
            self.num_anchors, (1, 1), kernel_init=_init, dtype=self.dtype, name="objectness_logits"
        )
        deltas = nn.Conv(
            self.num_anchors * self.box_dim, (1, 1), kernel_init=_init, dtype=self.dtype,
            name="anchor_deltas",
        )
        logits_out, deltas_out = [], []
        for x in features:
            for conv in convs:
                x = nn.relu(conv(x))
            n, h, w, _ = x.shape
            # outputs stay in the compute dtype: widening to f32 HERE costs
            # ~200 MB of f32 traffic at 640²/b128 (the p1 maps) and is
            # value-lossless to defer — bf16→f32 is exact, so top-k ordering
            # and the post-gather f32 decode see identical numbers; the
            # training loss path casts its (already gathered/flattened)
            # operands up instead (models/faster_rcnn.py train_forward)
            lg = obj(x).reshape(n, h * w * self.num_anchors)
            dl = deltas(x).reshape(n, h * w * self.num_anchors, self.box_dim)
            logits_out.append(lg)
            deltas_out.append(dl)
        return logits_out, deltas_out
