"""Pure-functional box math on ``(..., 4)`` xyxy float arrays.

TPU-native counterpart of the reference ``Boxes`` wrapper class and its
pairwise free functions (reference: ``python/src/structures/boxes.py:4-259``).
Instead of a tensor-owning class, every operation here is a pure function that
works on arbitrarily-batched arrays — the idiomatic JAX shape is ``(B, N, 4)``
with a companion ``(B, N)`` validity mask, so XLA sees only static shapes.

Padded (invalid) boxes are all-zero rows; every pairwise function is safe on
them (no NaNs: unions of empty boxes divide through a ``where`` guard).
Coordinates are ``x1, y1, x2, y2`` in absolute image pixels.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def area(boxes: Array) -> Array:
    """Area of each box. (reference ``boxes.py:149-156`` ``Boxes.area``)."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def clip(boxes: Array, height: Array, width: Array) -> Array:
    """Clip boxes to ``[0, width] x [0, height]``.

    Reference ``Boxes.clip`` (``boxes.py:56-72``) mutates in place and asserts
    finiteness; here we return a new array, and non-finite values are handled
    upstream by validity masks. ``height``/``width`` may be scalars or arrays
    broadcastable against ``boxes[..., 0]`` (per-image sizes in a batch).
    """
    height = jnp.asarray(height, boxes.dtype)
    width = jnp.asarray(width, boxes.dtype)
    x1 = jnp.clip(boxes[..., 0], 0, width)
    y1 = jnp.clip(boxes[..., 1], 0, height)
    x2 = jnp.clip(boxes[..., 2], 0, width)
    y2 = jnp.clip(boxes[..., 3], 0, height)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def nonempty(boxes: Array, threshold: float = 0.0) -> Array:
    """Boolean mask of boxes with width and height both > threshold.

    (reference ``Boxes.nonempty``, ``boxes.py:74-89``).
    """
    widths = boxes[..., 2] - boxes[..., 0]
    heights = boxes[..., 3] - boxes[..., 1]
    return (widths > threshold) & (heights > threshold)


def get_centers(boxes: Array) -> Array:
    """``(..., 2)`` array of box centers (reference ``boxes.py:158-163``)."""
    return (boxes[..., :2] + boxes[..., 2:]) / 2.0


def scale(boxes: Array, scale_x: Array, scale_y: Array) -> Array:
    """Scale box coordinates (reference ``Boxes.scale``, ``boxes.py:165-172``)."""
    sx = jnp.asarray(scale_x, boxes.dtype)
    sy = jnp.asarray(scale_y, boxes.dtype)
    return jnp.stack(
        [
            boxes[..., 0] * sx,
            boxes[..., 1] * sy,
            boxes[..., 2] * sx,
            boxes[..., 3] * sy,
        ],
        axis=-1,
    )


def inside_box(boxes: Array, box_size: tuple, boundary_threshold: float = 0.0) -> Array:
    """Mask of boxes fully inside ``(height, width)`` with slack.

    (reference ``Boxes.inside_box``, ``boxes.py:127-147``; used by the RPN's
    ``anchor_boundary_thresh`` option, reference ``rpn.py:170-173``).
    """
    height, width = box_size
    return (
        (boxes[..., 0] >= -boundary_threshold)
        & (boxes[..., 1] >= -boundary_threshold)
        & (boxes[..., 2] < width + boundary_threshold)
        & (boxes[..., 3] < height + boundary_threshold)
    )


def pairwise_intersection(boxes1: Array, boxes2: Array) -> Array:
    """``(..., M, N)`` pairwise intersection areas.

    (reference ``pairwise_intersection``, ``boxes.py:176-190``). Supports
    leading batch dims: ``boxes1`` is ``(..., M, 4)``, ``boxes2`` ``(..., N, 4)``.
    """
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    return wh[..., 0] * wh[..., 1]


def pairwise_iou(boxes1: Array, boxes2: Array) -> Array:
    """``(..., M, N)`` pairwise IoU (reference ``pairwise_iou``, ``boxes.py:193-214``).

    Safe on degenerate/padded boxes: when the union is zero the IoU is 0
    (matching the reference's explicit ``torch.where(inter > 0, ...)``).
    """
    area1 = area(boxes1)
    area2 = area(boxes2)
    inter = pairwise_intersection(boxes1, boxes2)
    union = area1[..., :, None] + area2[..., None, :] - inter
    return jnp.where(inter > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)


def pairwise_ioa(boxes1: Array, boxes2: Array) -> Array:
    """``(..., M, N)`` intersection-over-area-of-boxes2.

    (reference ``pairwise_ioa``, ``boxes.py:217-234``).
    """
    area2 = area(boxes2)
    inter = pairwise_intersection(boxes1, boxes2)
    return jnp.where(inter > 0, inter / jnp.where(area2[..., None, :] > 0, area2[..., None, :], 1.0), 0.0)


def matched_boxlist_iou(boxes1: Array, boxes2: Array) -> Array:
    """Elementwise IoU of aligned box arrays ``(..., N, 4) -> (..., N)``.

    (reference ``matched_boxlist_iou``, ``boxes.py:237-259``).
    """
    area1 = area(boxes1)
    area2 = area(boxes2)
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    return jnp.where(inter > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)
