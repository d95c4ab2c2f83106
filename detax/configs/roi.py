"""ROI-heads configs (reference ``python/src/config/roi.py:7-98`` +
``config/matcher.py:3-26``).

Defaults mirror the reference: 512 proposals/img @ 0.25 positive, 80 classes,
append-GT on, pooler 7×7 ROIAlignV2 canonical 224 @ level 4 over p1..p4.
The reference's box head is dead code (SURVEY defects M4/M5); ``BoxHeadConf``
specifies the intended Detectron2-style conv+fc head that detax completes.
"""

from __future__ import annotations

from typing import Tuple

from detax.configs.base import BaseConf, register_conf
from detax.configs.rpn import Box2BoxTransformConf


@register_conf
class MatcherConf(BaseConf):
    thresholds: Tuple[float, ...] = (0.5,)
    labels: Tuple[int, ...] = (0, 1)
    allow_low_quality_matches: bool = False


def ProposalMatcherConf(**kwargs) -> MatcherConf:
    """Reference ``ProposalMatcherConf`` (``config/matcher.py:15-26``)."""
    return MatcherConf(**kwargs)


@register_conf
class ROIPoolerConf(BaseConf):
    output_size: Tuple[int, int] = (7, 7)
    type: str = "ROIAlignV2"  # ROIAlignV2 (aligned) | ROIAlign | ROIPool
    canonical_box_size: int = 224
    canonical_level: int = 4
    # reference default 0 = adaptive (dynamic shape); detax fixes it at 2
    sampling_ratio: int = 2
    # "xla" gather path | "pallas" window-DMA kernel (TPU hot path) |
    # "pallas_q8" int8 windows + int8 M variant of the pallas kernel
    # (serving lever; ΔmAP measured by scripts/eval_dmap.py)
    impl: str = "xla"
    # pallas-only serving option: emit the kernel's native (8, pw) pooled rows
    # (row 7 exactly zero) instead of slicing to (7, pw) — saves the XLA
    # reshape/slice/relayout chain on the kernel output. Requires a box head
    # with num_conv == 0 and fc0 params padded via
    # detax.models.roi_heads.pad_box_head_params_for_ph_pad.
    keep_ph_pad: bool = False


@register_conf
class BoxHeadConf(BaseConf):
    """Fast R-CNN conv+fc box head (completes reference ``roi_head.py`` M4)."""

    num_conv: int = 0
    conv_dim: int = 256
    num_fc: int = 2
    fc_dim: int = 1024
    norm: str = ""


@register_conf
class MaskHeadConf(BaseConf):
    """Mask R-CNN head (completes the reference's dead mask slots, M3)."""

    num_convs: int = 4
    conv_dim: int = 256


@register_conf
class KeypointHeadConf(BaseConf):
    """Keypoint R-CNN head (completes the reference's dead slot, M3)."""

    num_keypoints: int = 17
    num_convs: int = 8
    conv_dim: int = 512


@register_conf
class ROIConf(BaseConf):
    name: str = "roi-heads"
    batch_size_per_image: int = 512
    positive_fraction: float = 0.25
    num_classes: int = 80
    proposal_append_gt: bool = True
    proposal_matcher: MatcherConf = MatcherConf()
    train_on_pred_boxes: bool = False
    in_features: Tuple[str, ...] = ("p1", "p2", "p3", "p4")
    box_pooler: ROIPoolerConf = ROIPoolerConf()
    box_head: BoxHeadConf = BoxHeadConf()
    # Fast R-CNN inference (Detectron2 defaults for the completed head)
    box2box_transform: Box2BoxTransformConf = Box2BoxTransformConf(weights=(10.0, 10.0, 5.0, 5.0))
    score_thresh: float = 0.05
    nms_thresh: float = 0.5
    detections_per_image: int = 100
    smooth_l1_beta: float = 0.0
    # static cap on (proposal, class) candidates entering final NMS — the
    # TPU replacement for the reference's dynamic score-threshold filtering.
    # Counted over PRE-decode (gated-score) candidates: a candidate whose
    # box later decodes/clips to empty still occupies a slot rather than
    # yielding it to the next-best score (select-before-decode; dmAP ±0)
    pre_nms_candidates: int = 1000
    nms_impl: str = "xla"  # "xla" | "pallas" (see RegionProposalNetworkConf)
    # candidate-cap selection: "exact" (lax.top_k) | "approx"
    # (lax.approx_max_k over the flattened proposal×class scores —
    # serving-profile option, see RegionProposalNetworkConf.topk_impl)
    topk_impl: str = "exact"
    # instance segmentation (Mask R-CNN capability)
    mask_on: bool = False
    mask_head: MaskHeadConf = MaskHeadConf()
    mask_pooler: ROIPoolerConf = ROIPoolerConf(output_size=(14, 14))
    # mask loss runs on the first mask_rois sampled ROIs (sampling orders
    # foreground first); 28x28 targets cropped from GT bitmaps
    mask_rois: int = 128
    loss_mask_weight: float = 1.0
    # keypoint estimation (Keypoint R-CNN capability)
    keypoint_on: bool = False
    keypoint_head: KeypointHeadConf = KeypointHeadConf()
    keypoint_pooler: ROIPoolerConf = ROIPoolerConf(output_size=(14, 14))
    keypoint_rois: int = 128
    loss_keypoint_weight: float = 1.0
