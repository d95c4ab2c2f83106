"""Anchor generation as pure functions of static feature shapes.

Replaces the reference ``AnchorGenerator`` module + ``BufferList``
(``python/src/models/modules/anchor_generators.py:13-239``). On TPU, anchors
for a fixed input size are a compile-time constant: they are computed once
under ``jit`` from static shapes and folded by XLA — no buffers, no module.

Ordering contract (must match the head's output reshape): grid anchors are
row-major over (y, x) then anchor-within-cell, matching the reference's
``rearrange`` of head outputs to ``n (h w a) c`` (``rpn.py:270-284``) and the
cell-anchor loop order sizes-then-aspect-ratios
(``generate_cell_anchors``, ``anchor_generators.py:181-210``).
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import jax.numpy as jnp
from jax import Array


def _broadcast_per_level(params: Sequence, num_levels: int) -> List:
    """Reference ``_broadcast_params`` (``anchor_generators.py:33-55``):
    one entry per level, or a single entry broadcast to all levels."""
    params = list(params)
    if len(params) == num_levels:
        return params
    assert len(params) == 1, f"got {len(params)} param groups for {num_levels} levels"
    return params * num_levels


def cell_anchors(sizes: Sequence[float], aspect_ratios: Sequence[float]) -> Array:
    """``(A, 4)`` anchors centered at (0, 0), xyxy.

    ``aspect_ratio = height / width``; ``size = sqrt(area)``
    (reference ``generate_cell_anchors``, ``anchor_generators.py:181-210``).
    """
    anchors = []
    for size in sizes:
        anchor_area = size * size
        for ar in aspect_ratios:
            w = math.sqrt(anchor_area / ar)
            h = ar * w
            anchors.append([-w / 2.0, -h / 2.0, w / 2.0, h / 2.0])
    return jnp.asarray(anchors, jnp.float32)


def num_cell_anchors(
    sizes: Sequence[Sequence[float]], aspect_ratios: Sequence[Sequence[float]], num_levels: int
) -> List[int]:
    s = _broadcast_per_level(sizes, num_levels)
    a = _broadcast_per_level(aspect_ratios, num_levels)
    return [len(si) * len(ai) for si, ai in zip(s, a)]


def anchors_from_indices(
    idx: Array,
    feature_shape: Tuple[int, int],
    stride: int,
    sizes: Sequence[float],
    aspect_ratios: Sequence[float],
    offset: float = 0.0,
) -> Array:
    """Reconstruct grid anchors arithmetically from flat indices.

    Exactly equal to ``grid_anchors(...)[level][idx]`` (same float ops, same
    ordering contract: row-major (y, x) then anchor-within-cell) but with no
    HBM gather: a (B, k) row gather from a 76.8k-row constant costs ~1.7 ms
    at serving shapes, while this is a handful of VPU ops on the index
    array. Used by the RPN selection path after top-k.

    Args:
      idx: ``(..., k)`` int32 flat anchor indices within the level.
    Returns:
      ``(..., k, 4)`` float32 anchors.
    """
    h, w = feature_shape
    base = cell_anchors(sizes, aspect_ratios)  # (A, 4) constant
    a_count = base.shape[0]
    a = idx % a_count
    cell = idx // a_count
    x = (cell % w).astype(jnp.float32)
    y = (cell // w).astype(jnp.float32)
    sx = (x + offset) * stride
    sy = (y + offset) * stride
    shifts = jnp.stack([sx, sy, sx, sy], axis=-1)  # (..., k, 4)
    return shifts + jnp.take(base, a, axis=0)


def grid_anchors(
    feature_shapes: Sequence[Tuple[int, int]],
    strides: Sequence[int],
    sizes: Sequence[Sequence[float]],
    aspect_ratios: Sequence[Sequence[float]],
    offset: float = 0.0,
) -> List[Array]:
    """Per-level ``(Hi*Wi*A, 4)`` anchors in input-image coordinates.

    (reference ``_grid_anchors`` + ``_create_grid_offsets``,
    ``anchor_generators.py:136-179``.) All inputs are static Python values;
    under ``jit`` the result is a constant folded into the program.
    """
    num_levels = len(feature_shapes)
    sizes = _broadcast_per_level(sizes, num_levels)
    aspect_ratios = _broadcast_per_level(aspect_ratios, num_levels)

    out = []
    for (h, w), stride, s, a in zip(feature_shapes, strides, sizes, aspect_ratios):
        base = cell_anchors(s, a)  # (A, 4)
        shift_x = (jnp.arange(w, dtype=jnp.float32) + offset) * stride
        shift_y = (jnp.arange(h, dtype=jnp.float32) + offset) * stride
        sx = jnp.tile(shift_x[None, :], (h, 1))  # (H, W)
        sy = jnp.tile(shift_y[:, None], (1, w))
        shifts = jnp.stack([sx, sy, sx, sy], axis=-1)  # (H, W, 4)
        anchors = shifts[:, :, None, :] + base[None, None, :, :]  # (H, W, A, 4)
        out.append(anchors.reshape(-1, 4))
    return out
