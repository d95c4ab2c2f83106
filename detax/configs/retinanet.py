"""RetinaNet-style single-stage detector config (BASELINE config 3).

No reference analog exists (the reference is two-stage only); this follows
the standard RetinaNet contract: ResNet+FPN (P3-P7), shared 4-conv cls/box
towers, focal-loss scoring, class-aware NMS.
"""

from __future__ import annotations

from typing import Tuple

from detax.configs.base import BaseConf, register_conf
from detax.configs.detector import PreprocessConf
from detax.configs.fpn import FPNConf
from detax.configs.resnet import ResNetConf
from detax.configs.rpn import AnchorGeneratorConf, AnchorMatcherConf, Box2BoxTransformConf


@register_conf
class RetinaNetHeadConf(BaseConf):
    num_convs: int = 4
    prior_prob: float = 0.01  # focal-loss bias init
    norm: str = ""
    # int8 tower quantization (detax.ops.quant): None = bf16; "qat" =
    # fake-quant training/pricing numerics; "int8" = real int8 convs from
    # exported params (serving). The towers are the model's FLOP bulk
    # (docs/ceiling-analysis.md §RetinaNet: 8 convs at 97% MFU); predictors
    # stay bf16 — their outputs feed selection/decode directly.
    quant: object = None


@register_conf
class RetinaNetConf(BaseConf):
    name: str = "retinanet"
    backbone: FPNConf = FPNConf(
        bottom_up=ResNetConf(name="resnet-50", depth=50, stage_blocks=(3, 4, 6, 3), bottleneck=True),
        out_channels=256,
    )
    head: RetinaNetHeadConf = RetinaNetHeadConf()
    # standard RetinaNet runs its towers from stride 8 up (P3..P7 in FPN-paper
    # naming); detax's pyramid names are p1=stride4 .. p5=stride64, so the
    # head consumes p2..p5 — running the 4-conv 256ch towers on the stride-4
    # map would cost ~1 TFLOP/image
    anchor_generator: AnchorGeneratorConf = AnchorGeneratorConf(
        sizes=(
            (32.0, 40.32, 50.8),
            (64.0, 80.63, 101.59),
            (128.0, 161.26, 203.19),
            (256.0, 322.54, 406.37),
        ),
        aspect_ratios=((0.5, 1.0, 2.0),),
    )
    anchor_matcher: AnchorMatcherConf = AnchorMatcherConf(
        iou_thresholds=(0.4, 0.5), iou_labels=(0, -1, 1), allow_low_quality_matches=True
    )
    box2box_transform: Box2BoxTransformConf = Box2BoxTransformConf()
    preprocess: PreprocessConf = PreprocessConf()
    num_classes: int = 80
    in_features: Tuple[str, ...] = ("p2", "p3", "p4", "p5")
    focal_loss_alpha: float = 0.25
    focal_loss_gamma: float = 2.0
    smooth_l1_beta: float = 0.0
    score_thresh: float = 0.05
    nms_thresh: float = 0.5
    topk_candidates: int = 1000  # per level, pre-NMS
    # cap on the candidate pool entering the final class-aware NMS
    # (0 = all levels' candidates, the reference-exact default). The b128
    # HLO audit showed the argsort+gathers over the 5-level 5000-candidate
    # pool at ~19 ms/batch with 0% MFU; a top-k cap is the same ΔmAP-priced
    # lever family as the flagship's pre_nms_candidates / YOLO's
    # topk_candidates (scripts/eval_dmap_retinanet.py prices it).
    final_nms_candidates: int = 0
    detections_per_image: int = 100
    max_gt_boxes: int = 100
    nms_impl: str = "xla"  # "xla" | "pallas" (see RegionProposalNetworkConf)
    # candidate selection over the flattened (anchors × classes) scores:
    # "exact" (lax.top_k full sort) | "approx" (lax.approx_max_k,
    # TPU PartialReduce — measured 248 ms → 26 ms per batch-32 at 640² for
    # the 1.55M-column stride-8 level; candidate-set-faithful) | "anchor"
    # (per-anchor best class first, then approx top-k over anchors — another
    # 11× on the selection; deviation: ≤1 class candidate per anchor)
    topk_impl: str = "exact"
    # per-row recall target for approx_max_k (read by "approx" and "anchor"
    # selection); 0.95 = jax default. See RegionProposalNetworkConf.topk_recall.
    topk_recall: float = 0.95
