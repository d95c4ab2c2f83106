"""Composite models: backbones, RPN, ROI heads, full detectors.

Replaces the reference's ``python/src/models/`` tier. Every model is a Flax
module producing static-shaped outputs; the algorithmic glue (proposal
selection, matching, sampling, losses) lives in pure functions alongside each
model so the whole forward/backward stays inside one ``jit``.
"""

from detax.models.backbone import FeatureShape
from detax.models.resnet import ResNet
from detax.models.fpn import FPN
from detax.models.rpn import RegionProposalNetwork
from detax.models.roi_heads import StandardROIHeads
from detax.models.faster_rcnn import FasterRCNN
from detax.models.retinanet import RetinaNet
from detax.models.yolo import YOLO

__all__ = [
    "FeatureShape",
    "ResNet",
    "FPN",
    "RegionProposalNetwork",
    "StandardROIHeads",
    "FasterRCNN",
    "RetinaNet",
    "YOLO",
]
