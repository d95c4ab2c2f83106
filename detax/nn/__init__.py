"""Flax NN modules — the conv tier that lowers onto the TPU MXU.

Replaces the reference's ``python/src/models/modules/`` torch modules
(Conv2d wrapper, BasicStem, residual blocks, FPN blocks, RPN head, box head)
with NHWC Flax modules. Norms follow the reference's ``get_norm`` factory
(``modules/wrappers.py:60-88``: BN / GN / SyncBN) plus ``frozen_bn`` — the
standard choice for detection fine-tune that the reference lacked.
"""

from detax.nn.conv import ConvNorm, FrozenBatchNorm
from detax.nn.stem import BasicStem
from detax.nn.residual import BasicBlock, BottleneckBlock, ResNetStage
from detax.nn.fpn_blocks import FPNTopDown, LastLevelMaxPool
from detax.nn.rpn_head import RPNHead
from detax.nn.box_head import FastRCNNConvFCHead, FastRCNNOutputLayers
from detax.nn.mask_head import MaskRCNNHead
from detax.nn.retina_head import RetinaNetHead
from detax.nn.yolo_head import YOLOHead
from detax.nn.anchors import cell_anchors, grid_anchors, num_cell_anchors

__all__ = [
    "ConvNorm",
    "FrozenBatchNorm",
    "BasicStem",
    "BasicBlock",
    "BottleneckBlock",
    "ResNetStage",
    "FPNTopDown",
    "LastLevelMaxPool",
    "RPNHead",
    "FastRCNNConvFCHead",
    "FastRCNNOutputLayers",
    "MaskRCNNHead",
    "RetinaNetHead",
    "YOLOHead",
    "cell_anchors",
    "grid_anchors",
    "num_cell_anchors",
]
