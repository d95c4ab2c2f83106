"""Non-maximum suppression with static shapes — XLA reference implementations.

This replaces the reference's native boundary: ``torchvision.ops.nms`` /
``batched_nms`` (C++/CUDA), driven via ``python/src/utils.py:96-119`` and
``python/src/models/utils.py:95``. Greedy NMS is inherently sequential; the
TPU formulation here bounds the sequential depth by the *output* size:
``nms_select`` runs ``max_out`` iterations of (argmax over scores → suppress
by IoU), each a wide VPU-friendly vector op, and is exactly equivalent to
full greedy NMS truncated to ``max_out`` survivors — which is all any caller
ever keeps (``keep[:post_nms_topk]`` at ``models/utils.py:105``).

``suppression_mask`` is the O(N²)-matrix exact variant used for small N and
as the oracle in tests. The Pallas TPU kernel lives in
``detax.ops.nms_pallas`` and must match these semantics bit-for-bit at fp32.

Class-aware / level-aware NMS uses the reference's coordinate-offset trick
(``utils.py:96-110``): boxes of different classes are translated to disjoint
regions so one single-class NMS pass handles all classes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array


def _iou_one_vs_many(box: Array, boxes: Array) -> Array:
    """IoU of one ``(4,)`` box against ``(N, 4)`` boxes."""
    area1 = (box[2] - box[0]) * (box[3] - box[1])
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    lt = jnp.maximum(box[:2], boxes[:, :2])
    rb = jnp.minimum(box[2:], boxes[:, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[:, 0] * wh[:, 1]
    union = area1 + areas - inter
    return jnp.where(inter > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)


def nms_select(
    boxes: Array,
    scores: Array,
    iou_threshold: float,
    max_out: int,
    valid: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Greedy NMS, emitting the first ``max_out`` surviving indices.

    Exactly torchvision's ``nms`` (suppress IoU **strictly greater** than the
    threshold) truncated to ``max_out`` picks, score-descending.

    Args:
      boxes: ``(N, 4)`` xyxy.
      scores: ``(N,)``.
      valid: optional ``(N,)`` bool; invalid boxes are never selected.

    Returns:
      ``(indices, keep_valid)``: ``(max_out,)`` int32 indices (0-padded) and
      ``(max_out,)`` bool mask of real selections.
    """
    n = boxes.shape[0]
    live = jnp.where(valid, scores, -jnp.inf) if valid is not None else scores
    live = live.astype(jnp.float32)
    arange = jnp.arange(n)

    def body(live_scores, _):
        i = jnp.argmax(live_scores)
        sel_ok = live_scores[i] > -jnp.inf
        ious = _iou_one_vs_many(boxes[i], boxes)
        suppress = (ious > iou_threshold) | (arange == i)
        nxt = jnp.where(sel_ok & suppress, -jnp.inf, live_scores)
        return nxt, (i.astype(jnp.int32), sel_ok)

    _, (idx, ok) = jax.lax.scan(body, live, None, length=max_out)
    idx = jnp.where(ok, idx, 0)
    return idx, ok


def suppression_mask(
    boxes: Array,
    scores: Array,
    iou_threshold: float,
    valid: Optional[Array] = None,
) -> Array:
    """Exact full greedy NMS keep-mask over all N boxes (O(N²) memory).

    Used for small N and as the test oracle; equivalent to
    ``torchvision.ops.nms`` returning a membership mask instead of sorted
    indices.
    """
    n = boxes.shape[0]
    s = jnp.where(valid, scores, -jnp.inf) if valid is not None else scores
    order = jnp.argsort(-s)
    sorted_boxes = jnp.take(boxes, order, axis=0)
    sorted_valid = jnp.take(s, order) > -jnp.inf

    from detax.structures.boxes import pairwise_iou

    iou = pairwise_iou(sorted_boxes, sorted_boxes)
    pos = jnp.arange(n)

    def body(i, keep):
        row_suppress = (iou[i] > iou_threshold) & (pos > i) & keep[i]
        return keep & ~row_suppress

    keep_sorted = jax.lax.fori_loop(0, n, body, sorted_valid)
    # Scatter back to original order.
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return keep


def multiclass_nms(
    boxes: Array,
    scores: Array,
    classes: Array,
    iou_threshold: float,
    max_out: int,
    valid: Array,
    impl: str = "xla",
) -> Tuple[Array, Array, Array, Array]:
    """Batched class-aware NMS over ``(B, N, ...)`` candidates.

    Shared final-suppression stage of every detector head (Fast R-CNN,
    RetinaNet, YOLO). ``impl='pallas'`` routes through the blocked TPU kernel
    (one call for the whole batch, candidates sorted here); ``'xla'`` runs
    the per-image scan under ``vmap``.

    Returns ``(boxes, scores, classes, valid)`` with capacity ``max_out``,
    score-descending.
    """
    if impl == "pallas":
        from detax.ops.nms_pallas import batch_class_aware_keep

        n = boxes.shape[1]
        s = jnp.where(valid, scores, -jnp.inf)
        order = jnp.argsort(-s, axis=1)
        sb = jnp.take_along_axis(boxes, order[..., None], axis=1)
        ss = jnp.take_along_axis(s, order, axis=1)
        sc = jnp.take_along_axis(classes, order, axis=1)
        sv = ss > -jnp.inf
        keep = batch_class_aware_keep(sb, ss, sc, iou_threshold, sv)
        pos = jnp.arange(n)[None, :]
        key = jnp.where(keep, pos, n)
        top = jnp.sort(key, axis=1)[:, :max_out]
        ok = top < n
        safe = jnp.where(ok, top, 0)
        return (
            jnp.take_along_axis(sb, safe[..., None], axis=1),
            jnp.where(ok, jnp.take_along_axis(ss, safe, axis=1), 0.0),
            jnp.take_along_axis(sc, safe, axis=1),
            ok,
        )

    def per_image(bx, s, cl, v):
        idx, ok = batched_nms(bx, s, cl, iou_threshold, max_out, valid=v)
        return jnp.take(bx, idx, axis=0), jnp.take(s, idx), jnp.take(cl, idx), ok

    db, ds, dc, ok = jax.vmap(per_image)(boxes, scores, classes, valid)
    return db, jnp.where(ok, ds, 0.0), dc, ok


def batched_nms(
    boxes: Array,
    scores: Array,
    idxs: Array,
    iou_threshold: float,
    max_out: int,
    valid: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Class- or level-aware NMS via coordinate offsetting.

    (reference ``batched_nms``, ``python/src/utils.py:96-119``: boxes with
    different ``idxs`` never suppress each other.) Returns the same
    ``(indices, keep_valid)`` contract as :func:`nms_select`.
    """
    if valid is not None:
        safe_boxes = jnp.where(valid[:, None], boxes, 0.0)
    else:
        safe_boxes = boxes
    max_coordinate = jnp.max(safe_boxes)
    offsets = idxs.astype(boxes.dtype) * (max_coordinate + 1.0)
    shifted = boxes + offsets[:, None]
    return nms_select(shifted, scores, iou_threshold, max_out, valid=valid)
