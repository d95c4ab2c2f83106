"""ResNet backbone (reference ``ResNet18``, ``backbones/res_net.py:13-148``).

Stem + 4 stages returning a dict of ``res1..res4`` NHWC features (strides
4/8/16/32), with an optional avgpool+fc classifier head when
``num_classes > 0`` (reference ``res_net.py:66-75``). Supports both basic
(depth 18/34) and bottleneck (depth 50+) blocks — the reference's
``ResidualBlock50`` could never run (defect M6).

TPU notes: compute dtype is configurable (bfloat16 for the hot path);
``frozen_bn`` default folds into convs at compile time.
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from detax.configs.resnet import ResNetConf
from detax.nn.residual import ResNetStage
from detax.nn.stem import BasicStem


class ResNet(nn.Module):
    conf: ResNetConf
    dtype: Optional[jnp.dtype] = None
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        conf = self.conf
        x = BasicStem(
            out_channels=conf.stem_channels,
            norm=conf.norm,
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
            name="stem",
        )(x, train=train)

        outputs: Dict[str, jnp.ndarray] = {}
        for i, (blocks, channels) in enumerate(zip(conf.stage_blocks, conf.stage_channels)):
            name = f"res{i + 1}"
            x = ResNetStage(
                num_blocks=blocks,
                features=channels,
                strides=1 if i == 0 else 2,  # res1 keeps the stem's stride 4
                bottleneck=conf.bottleneck,
                norm=conf.norm,
                bn_axis_name=self.bn_axis_name,
                dtype=self.dtype,
                name=name,
            )(x, train=train)
            if name in conf.out_features:
                outputs[name] = x

        if conf.num_classes > 0:
            pooled = jnp.mean(x, axis=(1, 2))
            logits = nn.Dense(conf.num_classes, name="fc")(pooled.astype(jnp.float32))
            outputs["logits"] = logits
        return outputs
