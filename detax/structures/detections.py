"""Fixed-capacity detection pytrees — the TPU replacement for ``Instances``.

The reference's ``Instances`` (``python/src/structures/instances.py:7-191``)
is a per-image, variable-length field bag; on TPU every collection must be
static-shaped, so detax carries ``(B, N, ...)`` arrays plus a ``(B, N)``
validity mask. Slots beyond the valid count hold zeros and must be ignored by
all consumers (every op in ``detax.ops`` is mask-aware).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax import Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Detections:
    """A batch of fixed-capacity detections / proposals.

    Fields mirror the reference's ``Instances`` field names
    (``proposal_boxes``/``objectness_logits`` in RPN, ``pred_boxes``/``scores``
    /``pred_classes`` in ROI heads) collapsed into one static pytree:

    - ``boxes``: ``(B, N, 4)`` xyxy, absolute pixels.
    - ``scores``: ``(B, N)`` objectness logits (RPN) or class scores (final).
    - ``classes``: ``(B, N)`` int32 class ids (0 for RPN proposals).
    - ``valid``: ``(B, N)`` bool; False rows are padding.
    """

    boxes: Array
    scores: Array
    classes: Array
    valid: Array
    # optional (B, N, mh, mw) per-detection mask logits (Mask R-CNN)
    mask_logits: Optional[Array] = None
    # optional (B, N, K, 3) per-detection keypoints (x, y, score)
    keypoints: Optional[Array] = None

    @property
    def capacity(self) -> int:
        return self.boxes.shape[-2]

    def num_valid(self) -> Array:
        """``(B,)`` count of valid entries (replaces ``len(Instances)``)."""
        return jnp.sum(self.valid, axis=-1)

    @staticmethod
    def empty(batch: int, capacity: int, dtype=jnp.float32) -> "Detections":
        return Detections(
            boxes=jnp.zeros((batch, capacity, 4), dtype),
            scores=jnp.full((batch, capacity), -jnp.inf, dtype),
            classes=jnp.zeros((batch, capacity), jnp.int32),
            valid=jnp.zeros((batch, capacity), bool),
        )

    @staticmethod
    def concatenate(dets: list["Detections"]) -> "Detections":
        """Concatenate along the capacity axis (reference ``Instances.cat``,
        ``instances.py:147-179``)."""
        return Detections(
            boxes=jnp.concatenate([d.boxes for d in dets], axis=-2),
            scores=jnp.concatenate([d.scores for d in dets], axis=-1),
            classes=jnp.concatenate([d.classes for d in dets], axis=-1),
            valid=jnp.concatenate([d.valid for d in dets], axis=-1),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GroundTruth:
    """Padded ground-truth annotations for a batch of images.

    Replaces the reference's per-image list of GT ``Instances``
    (``gt_boxes``/``gt_classes`` fields consumed at ``rpn.py:155-158`` and
    ``roi.py:140-186``).

    - ``boxes``: ``(B, G, 4)`` xyxy.
    - ``classes``: ``(B, G)`` int32 in ``[0, num_classes)``.
    - ``valid``: ``(B, G)`` bool.
    """

    boxes: Array
    classes: Array
    valid: Array
    # optional (B, G, mh, mw) instance bitmaps in canvas coords at a fixed
    # stride (see PreprocessConf) for the mask loss
    masks: Optional[Array] = None
    # optional (B, G, K, 3) keypoints (x, y, visibility) in canvas coords
    keypoints: Optional[Array] = None

    @property
    def capacity(self) -> int:
        return self.boxes.shape[-2]

    def num_valid(self) -> Array:
        return jnp.sum(self.valid, axis=-1)

    @staticmethod
    def from_lists(
        boxes_list,
        classes_list,
        capacity: int,
        masks_list=None,
        mask_hw=None,
    ) -> "GroundTruth":
        """Host-side helper: pad a list of per-image ``(g_i, 4)`` numpy arrays
        to a fixed-capacity batch. Truncates beyond ``capacity``."""
        import numpy as np

        batch = len(boxes_list)
        boxes = np.zeros((batch, capacity, 4), np.float32)
        classes = np.zeros((batch, capacity), np.int32)
        valid = np.zeros((batch, capacity), bool)
        masks = None
        if masks_list is not None:
            assert mask_hw is not None
            masks = np.zeros((batch, capacity) + tuple(mask_hw), np.uint8)
        for i, (b, c) in enumerate(zip(boxes_list, classes_list)):
            g = min(len(b), capacity)
            if g:
                boxes[i, :g] = np.asarray(b, np.float32)[:g]
                classes[i, :g] = np.asarray(c, np.int32)[:g]
                valid[i, :g] = True
                if masks is not None and len(masks_list[i]):
                    masks[i, :g] = np.asarray(masks_list[i], np.uint8)[:g]
        return GroundTruth(
            boxes=jnp.asarray(boxes),
            classes=jnp.asarray(classes),
            valid=jnp.asarray(valid),
            masks=jnp.asarray(masks) if masks is not None else None,
        )
