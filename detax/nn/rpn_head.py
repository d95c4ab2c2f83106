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


class _SiblingParams(nn.Module):
    """Parameter holder for one 1×1 sibling conv.

    Tree, shapes, and init are identical to
    ``nn.Conv(features, (1, 1), kernel_init=_init)`` — checkpoints and the
    torch weight import are unchanged — but the conv itself is applied by
    the caller, fused across siblings (one channel matmul instead of two
    full-map read passes per level)."""

    features: int
    in_ch: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", _init, (1, 1, self.in_ch, self.features))
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return kernel, bias


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
        a = self.num_anchors
        in_ch = self.conv_dims[-1]
        k_obj, b_obj = _SiblingParams(a, in_ch, name="objectness_logits")()
        k_del, b_del = _SiblingParams(a * self.box_dim, in_ch, name="anchor_deltas")()
        # the sibling 1×1s fused into ONE channel matmul: two separate convs
        # each re-read the full 64-ch map at every level (~560 MB/batch at
        # 640²/b128); values are identical — a 1×1 conv IS a channel matmul
        kf = jnp.concatenate([k_obj[0, 0], k_del[0, 0]], axis=-1)  # (C, A+A*4)
        bf = jnp.concatenate([b_obj, b_del], axis=-1)
        logits_out, deltas_out = [], []
        for x in features:
            for conv in convs:
                x = nn.relu(conv(x))
            n, h, w, _ = x.shape
            dtype = self.dtype or x.dtype
            y = x.astype(dtype) @ kf.astype(dtype) + bf.astype(dtype)
            # outputs stay in the compute dtype: widening to f32 HERE costs
            # ~200 MB of f32 traffic at 640²/b128 (the p1 maps) and is
            # value-lossless to defer — bf16→f32 is exact, so top-k ordering
            # and the post-gather f32 decode see identical numbers; the
            # training loss path casts its (already gathered/flattened)
            # operands up instead (models/faster_rcnn.py train_forward)
            lg = y[..., :a].reshape(n, h * w * a)
            dl = y[..., a:].reshape(n, h, w, a, self.box_dim).reshape(
                n, h * w * a, self.box_dim
            )
            logits_out.append(lg)
            deltas_out.append(dl)
        return logits_out, deltas_out
