"""Feature Pyramid Network backbone (reference ``FPN``,
``backbones/fpn.py:13-129``).

Wraps the bottom-up ResNet, runs the coarsest→finest top-down pathway
(the reference iterates ``reversed(res4..res1)``, ``fpn.py:72-80``), and
appends the extra ``p5`` level via stride-2 max pool on ``p4``
(``fpn.py:82-85``). Output names keep the reference's convention:
``p1`` stride 4 … ``p4`` stride 32, ``p5`` stride 64, all ``out_channels``
channels.
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from detax.configs.fpn import FPNConf
from detax.models.resnet import ResNet
from detax.nn.fpn_blocks import FPNTopDown, LastLevelMaxPool


class FPN(nn.Module):
    conf: FPNConf
    dtype: Optional[jnp.dtype] = None
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        conf = self.conf
        bottom_up = ResNet(
            conf=conf.bottom_up, dtype=self.dtype, bn_axis_name=self.bn_axis_name, name="bottom_up"
        )(x, train=train)

        in_features = list(conf.in_features)  # fine→coarse, e.g. res1..res4
        outputs: Dict[str, jnp.ndarray] = {}
        top: Optional[jnp.ndarray] = None
        # coarse→fine top-down pathway with per-stage lateral+output convs
        for name in reversed(in_features):
            stage_idx = int(name[3:])  # res4 → 4
            out, top = FPNTopDown(
                out_channels=conf.out_channels,
                norm=conf.norm,
                fuse_type=conf.fuse_type,
                dtype=self.dtype,
                name=f"fpn{stage_idx}",
            )(bottom_up[name], top, train=train)
            outputs[f"p{stage_idx}"] = out

        if conf.top_block == "maxpool" and "p5" in conf.out_features:
            coarsest = f"p{len(in_features)}"  # p4
            outputs["p5"] = LastLevelMaxPool(name="top_block")(outputs[coarsest])
        return {k: outputs[k] for k in conf.out_features if k in outputs}
