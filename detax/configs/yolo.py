"""YOLO-style multi-scale anchor head config (BASELINE config 4).

No reference analog; standard 3-stride anchor-based YOLO head over the
backbone's three coarsest levels, per-level NMS handled by the Pallas
kernel in ``detax.ops.nms_pallas``.
"""

from __future__ import annotations

from typing import Tuple

from detax.configs.base import BaseConf, register_conf
from detax.configs.detector import PreprocessConf
from detax.configs.resnet import ResNetConf


@register_conf
class YOLOHeadConf(BaseConf):
    # anchors (w, h) per stride level, in input pixels — classic COCO priors
    anchors: Tuple[Tuple[Tuple[float, float], ...], ...] = (
        ((10.0, 13.0), (16.0, 30.0), (33.0, 23.0)),
        ((30.0, 61.0), (62.0, 45.0), (59.0, 119.0)),
        ((116.0, 90.0), (156.0, 198.0), (373.0, 326.0)),
    )
    strides: Tuple[int, ...] = (8, 16, 32)
    hidden_dim: int = 256


@register_conf
class YOLOConf(BaseConf):
    name: str = "yolo"
    backbone: ResNetConf = ResNetConf(name="resnet-18")
    head: YOLOHeadConf = YOLOHeadConf()
    preprocess: PreprocessConf = PreprocessConf()
    num_classes: int = 80
    in_features: Tuple[str, ...] = ("res2", "res3", "res4")
    conf_thresh: float = 0.05
    nms_thresh: float = 0.5
    topk_candidates: int = 1000  # per level, pre-NMS
    detections_per_image: int = 100
    max_gt_boxes: int = 100
    nms_impl: str = "xla"  # "xla" | "pallas" (per-level Pallas NMS path)
    # training assignment: every wh-prior whose shape-IoU with the GT clears
    # this is a positive at the GT's center cell (the best prior is always
    # kept as a fallback) — 2-3x the positives of best-prior-only, which the
    # from-scratch objectness/box heads need on short synthetic schedules
    assign_iou_thresh: float = 0.5
    obj_loss_weight: float = 1.0
    cls_loss_weight: float = 1.0
    box_loss_weight: float = 5.0
