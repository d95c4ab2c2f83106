"""ResNet backbone configs.

Counterpart of the reference's declarative per-stage conv shapes
(``python/src/config/res_net.py:6-89``): the reference spells out every conv's
ShapeSpec; detax derives them from the standard (depth → block counts/widths)
parameterization, which produces the identical architecture (ResNet-18:
4 stages × 2 basic blocks, channels 64→512, strides 4/8/16/32) with far less
config surface. Fields are tuples so configs stay hashable for ``jit``.
"""

from __future__ import annotations

from typing import Tuple

from detax.configs.base import BaseConf, register_conf


@register_conf
class ResNetConf(BaseConf):
    name: str = "resnet"
    depth: int = 18
    stem_channels: int = 64
    # per-stage (blocks, out_channels); bottleneck blocks multiply by expansion
    stage_blocks: Tuple[int, ...] = (2, 2, 2, 2)
    stage_channels: Tuple[int, ...] = (64, 128, 256, 512)
    bottleneck: bool = False  # True → ResNet-50-style blocks (expansion 4)
    # frozen_bn (default, standard for detection fine-tune) | bn | gn | none.
    # Trainable "bn" requires mutable=["batch_stats"] in apply() and updates
    # stats cross-replica when bn_axis_name is set (SyncBN).
    norm: str = "frozen_bn"
    # features exposed to FPN, named res1..res4 like the reference
    # (res_net.py:59-64); strides 4/8/16/32
    out_features: Tuple[str, ...] = ("res1", "res2", "res3", "res4")
    num_classes: int = 0  # >0 adds the avgpool+fc classifier head (res_net.py:66-75)

    @property
    def expansion(self) -> int:
        return 4 if self.bottleneck else 1


def ResNet18Conf(**kwargs) -> ResNetConf:
    """Reference ``ResNet18Conf`` defaults (``config/res_net.py:18-89``)."""
    return ResNetConf(name="resnet-18", depth=18, stage_blocks=(2, 2, 2, 2), bottleneck=False, **kwargs)


def ResNet50Conf(**kwargs) -> ResNetConf:
    """ResNet-50 (bottleneck) — BASELINE config 3's backbone."""
    return ResNetConf(name="resnet-50", depth=50, stage_blocks=(3, 4, 6, 3), bottleneck=True, **kwargs)
