"""Typed dataclass configs with JSON round-trip.

Replaces the reference's ``python/src/config/`` tier (``BaseConf`` +
per-component ``*Conf`` classes, re-exported at ``config/__init__.py:1-23``)
with frozen dataclasses: same nesting, same defaults (Appendix B of
SURVEY.md), same JSON save/load contract (``config/base.py:39-57``), but
hashable/static so configs can be closed over by ``jax.jit``.
"""

from detax.configs.base import BaseConf, config_from_dict, register_conf
from detax.configs.resnet import ResNetConf, ResNet18Conf, ResNet50Conf
from detax.configs.fpn import FPNConf
from detax.configs.rpn import (
    AnchorGeneratorConf,
    AnchorMatcherConf,
    Box2BoxTransformConf,
    RPNHeadConf,
    RegionProposalNetworkConf,
)
from detax.configs.roi import (
    BoxHeadConf,
    MaskHeadConf,
    MatcherConf,
    ProposalMatcherConf,
    ROIConf,
    ROIPoolerConf,
)
from detax.configs.detector import FasterRCNNConf, PreprocessConf
from detax.configs.retinanet import RetinaNetConf, RetinaNetHeadConf
from detax.configs.yolo import YOLOConf, YOLOHeadConf

__all__ = [
    "BaseConf",
    "config_from_dict",
    "register_conf",
    "ResNetConf",
    "ResNet18Conf",
    "ResNet50Conf",
    "FPNConf",
    "AnchorGeneratorConf",
    "AnchorMatcherConf",
    "Box2BoxTransformConf",
    "RPNHeadConf",
    "RegionProposalNetworkConf",
    "MatcherConf",
    "ProposalMatcherConf",
    "ROIPoolerConf",
    "BoxHeadConf",
    "MaskHeadConf",
    "ROIConf",
    "FasterRCNNConf",
    "PreprocessConf",
    "RetinaNetConf",
    "RetinaNetHeadConf",
    "YOLOConf",
    "YOLOHeadConf",
]
