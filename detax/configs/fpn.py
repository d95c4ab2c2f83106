"""FPN config (reference ``python/src/config/fpn.py:8-90``).

Defaults reproduce the reference contract: 64 out-channels, outputs
``p1..p5`` (p1 stride 4 … p4 stride 32, p5 = maxpool(p4) stride 64), sum
fusion, lateral 1×1 + output 3×3 convs per stage, no norm + bias on
(the reference's ``use_bias == (norm == "")`` convention, ``fpn.py:39`` —
detax derives bias from norm instead of asserting the M13 trap).
"""

from __future__ import annotations

from typing import Tuple

from detax.configs.base import BaseConf, register_conf
from detax.configs.resnet import ResNetConf


@register_conf
class FPNConf(BaseConf):
    name: str = "fpn"
    bottom_up: ResNetConf = ResNetConf(name="resnet-18")
    out_channels: int = 64
    in_features: Tuple[str, ...] = ("res1", "res2", "res3", "res4")
    out_features: Tuple[str, ...] = ("p1", "p2", "p3", "p4", "p5")
    norm: str = ""  # "" → bias convs (reference FPNStageConf defaults)
    fuse_type: str = "sum"  # sum | avg (reference fpn.py fuse_type)
    top_block: str = "maxpool"  # LastLevelMaxPool (config/fpn.py:17-27); "none" disables p5
