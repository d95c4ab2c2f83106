"""R-CNN box-to-box transform: (dx, dy, dw, dh) encode / decode.

Pure-functional, batched version of the reference ``Box2BoxTransform``
(``python/src/models/components/box_regression.py:11-125``, a
``@torch.jit.script`` class). The TPU design keeps the transform a free
function of ``(..., 4)`` arrays so it fuses into surrounding XLA programs and
vmaps over batch / level dims with no per-image Python loops.

Decode is forced to float32 (the reference casts ``deltas.float()`` at
``box_regression.py:91`` for decoding precision) — important when the network
runs in bfloat16.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
from jax import Array

# Clamp dw/dh so exp() can't blow up: no larger than what would turn a 16px
# box into a 1000px box (reference ``python/src/config/rpn.py:10``).
DEFAULT_SCALE_CLAMP = math.log(1000.0 / 16)

Weights = Tuple[float, float, float, float]


def get_deltas(
    src_boxes: Array,
    target_boxes: Array,
    weights: Weights = (1.0, 1.0, 1.0, 1.0),
) -> Array:
    """Encode: deltas such that ``apply_deltas(deltas, src) == target``.

    (reference ``Box2BoxTransform.get_deltas``, ``box_regression.py:33-74``.)
    Shapes: ``(..., 4) x (..., 4) -> (..., 4)``. Degenerate src boxes
    (width/height <= 0, e.g. padded rows) produce garbage deltas; callers mask
    them out — the reference instead asserts ``src_widths > 0``, which is not
    expressible under jit.
    """
    src = src_boxes.astype(jnp.float32)
    tgt = target_boxes.astype(jnp.float32)
    src_w = src[..., 2] - src[..., 0]
    src_h = src[..., 3] - src[..., 1]
    src_cx = src[..., 0] + 0.5 * src_w
    src_cy = src[..., 1] + 0.5 * src_h

    tgt_w = tgt[..., 2] - tgt[..., 0]
    tgt_h = tgt[..., 3] - tgt[..., 1]
    tgt_cx = tgt[..., 0] + 0.5 * tgt_w
    tgt_cy = tgt[..., 1] + 0.5 * tgt_h

    wx, wy, ww, wh = weights
    # Guard divisions/logs so padded rows yield finite (masked-out) values.
    safe_w = jnp.where(src_w > 0, src_w, 1.0)
    safe_h = jnp.where(src_h > 0, src_h, 1.0)
    safe_tw = jnp.where(tgt_w > 0, tgt_w, 1.0)
    safe_th = jnp.where(tgt_h > 0, tgt_h, 1.0)
    dx = wx * (tgt_cx - src_cx) / safe_w
    dy = wy * (tgt_cy - src_cy) / safe_h
    dw = ww * jnp.log(safe_tw / safe_w)
    dh = wh * jnp.log(safe_th / safe_h)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def apply_deltas(
    deltas: Array,
    boxes: Array,
    weights: Weights = (1.0, 1.0, 1.0, 1.0),
    scale_clamp: float = DEFAULT_SCALE_CLAMP,
) -> Array:
    """Decode: apply ``(dx, dy, dw, dh)`` to boxes.

    (reference ``Box2BoxTransform.apply_deltas``, ``box_regression.py:76-118``.)

    ``deltas`` is ``(..., K, 4)`` or ``(..., 4)``; ``boxes`` is ``(..., 4)``
    and broadcasts against the leading dims of ``deltas``. The reference packs
    class-specific deltas as ``(N, k*4)`` strided slices; detax callers reshape
    to an explicit K axis instead (static and layout-friendly).
    """
    deltas = deltas.astype(jnp.float32)
    boxes = boxes.astype(jnp.float32)
    squeeze = deltas.ndim == boxes.ndim
    if squeeze:
        deltas = deltas[..., None, :]

    widths = boxes[..., 2] - boxes[..., 0]
    heights = boxes[..., 3] - boxes[..., 1]
    ctr_x = boxes[..., 0] + 0.5 * widths
    ctr_y = boxes[..., 1] + 0.5 * heights

    wx, wy, ww, wh = weights
    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.minimum(deltas[..., 2] / ww, scale_clamp)
    dh = jnp.minimum(deltas[..., 3] / wh, scale_clamp)

    pred_cx = dx * widths[..., None] + ctr_x[..., None]
    pred_cy = dy * heights[..., None] + ctr_y[..., None]
    pred_w = jnp.exp(dw) * widths[..., None]
    pred_h = jnp.exp(dh) * heights[..., None]

    out = jnp.stack(
        [
            pred_cx - 0.5 * pred_w,
            pred_cy - 0.5 * pred_h,
            pred_cx + 0.5 * pred_w,
            pred_cy + 0.5 * pred_h,
        ],
        axis=-1,
    )
    return out[..., 0, :] if squeeze else out
