"""RPN configs — defaults mirror the reference contract exactly.

(reference ``python/src/config/rpn.py:14-161``; values tabulated in SURVEY.md
Appendix B: anchor sizes [32..512] × ratios [0.5,1,2], IoU thresholds
[0.3,0.7] → labels [0,-1,1], 256 anchors/img @ 0.5 positive, pre-NMS top-k
(12000, 6000) train/test, post-NMS (2000, 1000), NMS 0.7, smooth-l1 β=0,
delta clamp log(1000/16).)
"""

from __future__ import annotations

import math
from typing import Tuple

from detax.configs.base import BaseConf, register_conf

_DEFAULT_SCALE_CLAMP = math.log(1000.0 / 16)


@register_conf
class AnchorGeneratorConf(BaseConf):
    # sizes[i] = anchor sizes (sqrt area, input pixels) for feature level i
    sizes: Tuple[Tuple[float, ...], ...] = ((32.0,), (64.0,), (128.0,), (256.0,), (512.0,))
    aspect_ratios: Tuple[Tuple[float, ...], ...] = ((0.5, 1.0, 2.0),)
    offset: float = 0.0
    box_dim: int = 4


@register_conf
class AnchorMatcherConf(BaseConf):
    iou_thresholds: Tuple[float, ...] = (0.3, 0.7)
    iou_labels: Tuple[int, ...] = (0, -1, 1)
    allow_low_quality_matches: bool = True


@register_conf
class Box2BoxTransformConf(BaseConf):
    weights: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0)
    scale_clamp: float = _DEFAULT_SCALE_CLAMP


@register_conf
class RPNHeadConf(BaseConf):
    in_channels: int = 64
    num_anchors: int = 3
    box_dim: int = 4
    conv_dims: Tuple[int, ...] = (64,)  # shared 3×3 conv stack (rpn_heads.py:81-100)


@register_conf
class RegionProposalNetworkConf(BaseConf):
    name: str = "region-proposal-network"
    head: RPNHeadConf = RPNHeadConf()
    anchor_generator: AnchorGeneratorConf = AnchorGeneratorConf()
    anchor_matcher: AnchorMatcherConf = AnchorMatcherConf()
    box2box_transform: Box2BoxTransformConf = Box2BoxTransformConf()
    batch_size_per_image: int = 256
    positive_fraction: float = 0.5
    pre_nms_topk: Tuple[int, int] = (12000, 6000)  # (train, test), per level
    post_nms_topk: Tuple[int, int] = (2000, 1000)
    nms_thresh: float = 0.7
    min_box_size: float = 0.0
    anchor_boundary_thresh: float = -1.0
    loss_weight_cls: float = 1.0
    loss_weight_loc: float = 1.0
    box_reg_loss_type: str = "smooth_l1"
    smooth_l1_beta: float = 0.0
    in_features: Tuple[str, ...] = ("p1", "p2", "p3", "p4", "p5")
    # "xla" (lax.scan greedy, runs everywhere) | "pallas" (blocked TPU kernel,
    # per-level batched — the fast path; interpreter-mode on CPU)
    nms_impl: str = "xla"
    # pre-NMS candidate selection: "exact" (lax.top_k, full sort — the parity
    # path) | "approx" (lax.approx_max_k, the TPU-native PartialReduce op,
    # ~2 ms faster per batch-32 at 640²; recall ≥ 0.95 on the top-1000 of
    # 76.8k anchors, quality-neutral for RPN proposals which are re-scored by
    # the ROI head anyway — serving-profile option)
    topk_impl: str = "exact"
    # per-row recall target for approx_max_k (only read when topk_impl ==
    # "approx"); 0.95 is the jax default. Lowering it shrinks the
    # PartialReduce intermediate (0.8 → ~5× faster on the 76.8k-anchor p1
    # level); tail anchors lost are the lowest-scored of the 1000 and are
    # re-scored by the ROI head anyway — ΔmAP measured in scripts/eval_dmap.py.
    topk_recall: float = 0.95
