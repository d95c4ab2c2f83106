"""Data structures: pure-array box math, fixed-capacity detection pytrees.

TPU-native replacement for the reference's ``python/src/structures/``
(``Boxes``/``Instances``/``ImageList`` wrapper classes): here boxes are plain
``(..., 4)`` xyxy float arrays operated on by pure functions, per-image
variable-length collections become fixed-capacity arrays + validity masks, and
variable-size image lists become a single letterboxed NHWC batch.
"""

from detax.structures import boxes
from detax.structures.boxes import (
    area,
    clip,
    get_centers,
    inside_box,
    matched_boxlist_iou,
    nonempty,
    pairwise_intersection,
    pairwise_ioa,
    pairwise_iou,
    scale,
)
from detax.structures.detections import Detections, GroundTruth
from detax.structures.image_batch import ImageBatch
from detax.structures.logs import Logs, get_logs

__all__ = [
    "area",
    "boxes",
    "clip",
    "get_centers",
    "inside_box",
    "matched_boxlist_iou",
    "nonempty",
    "pairwise_intersection",
    "pairwise_ioa",
    "pairwise_iou",
    "scale",
    "Detections",
    "GroundTruth",
    "ImageBatch",
    "Logs",
    "get_logs",
]
