"""Backbone feature-shape registry.

The reference's ``Backbone`` ABC tracks ``_out_feature_strides`` /
``_out_feature_channels`` and ``size_divisibility``
(``python/src/models/backbones/backbone.py:6-28``); in detax these are plain
static metadata computed from configs — used by anchor generation, the ROI
pooler's level assignment, and input-size validation.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

from detax.configs.fpn import FPNConf
from detax.configs.resnet import ResNetConf


@dataclasses.dataclass(frozen=True)
class FeatureShape:
    """Per-feature stride/channels (reference ``ShapeSpec`` usage in
    ``output_shapes()``, ``res_net.py:94-113`` / ``fpn.py:100-118``)."""

    stride: int
    channels: int

    def hw(self, image_size: int) -> Tuple[int, int]:
        assert image_size % self.stride == 0, (
            f"image size {image_size} not divisible by stride {self.stride}"
        )
        return image_size // self.stride, image_size // self.stride


_RESNET_STRIDES = {"res1": 4, "res2": 8, "res3": 16, "res4": 32}


def resnet_output_shapes(conf: ResNetConf) -> Dict[str, FeatureShape]:
    shapes = {}
    for i, name in enumerate(("res1", "res2", "res3", "res4")):
        if name in conf.out_features:
            shapes[name] = FeatureShape(
                stride=_RESNET_STRIDES[name],
                channels=conf.stage_channels[i] * conf.expansion,
            )
    return shapes


def fpn_output_shapes(conf: FPNConf) -> Dict[str, FeatureShape]:
    """p1..p4 mirror res1..res4 strides (4..32); p5 = 64 via maxpool
    (reference ``fpn.py:100-118``). All FPN outputs share ``out_channels``."""
    bottom = resnet_output_shapes(conf.bottom_up)
    shapes = {}
    for i, name in enumerate(conf.out_features):
        if name == "p5":
            shapes[name] = FeatureShape(stride=64, channels=conf.out_channels)
        else:
            res = f"res{name[1:]}"
            shapes[name] = FeatureShape(stride=bottom[res].stride, channels=conf.out_channels)
    return shapes


def size_divisibility(conf: FPNConf) -> int:
    """Coarsest stride; input HW must divide it (reference ``backbone.py:16-25``)."""
    return max(s.stride for s in fpn_output_shapes(conf).values())
