"""Conv + norm + activation building block.

Replaces the reference ``Conv2d`` wrapper + ``get_norm`` factory
(``python/src/models/modules/wrappers.py:5-88``). TPU notes:

- NHWC layout, HWIO kernels (XLA's native TPU conv layout).
- bias is automatically dropped when a norm follows (the convention the
  reference encodes as ``use_bias == (norm == "")``, ``config/fpn.py:39``).
- ``frozen_bn`` folds pretrained batch stats into a per-channel affine —
  the standard detection fine-tune norm; XLA fuses it into the conv.
- SyncBN (reference ``wrappers.py:86``) is ``norm='bn'`` with
  ``bn_axis_name='data'``: batch stats are all-reduced over the data mesh
  axis via XLA collectives instead of torch's SyncBatchNorm process group.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp


class FrozenBatchNorm(nn.Module):
    """BatchNorm with constant statistics and affine.

    All four tensors live in the ``params`` collection under names matching
    torch BN (``weight``/``bias``/``running_mean``/``running_var``) to make
    the PyTorch weight importer a pure rename; the train-state optimizer
    masks out any path containing ``frozen_bn`` (see detax.train).
    """

    features: int
    eps: float = 1e-5

    def setup(self):
        self.weight = self.param("weight", nn.initializers.ones, (self.features,))
        self.bias = self.param("bias", nn.initializers.zeros, (self.features,))
        self.running_mean = self.param(
            "running_mean", nn.initializers.zeros, (self.features,)
        )
        self.running_var = self.param(
            "running_var", nn.initializers.ones, (self.features,)
        )

    def scale_shift(self):
        """The folded per-channel affine ``(scale, shift)`` in fp32.

        For consumers that fold the frozen affine into an adjacent op
        (e.g. the stem folds ``scale`` into its conv kernel and applies
        ``shift`` after the max-pool — see detax/nn/stem.py)."""
        scale = self.weight * jax.lax.rsqrt(self.running_var + self.eps)
        shift = self.bias - self.running_mean * scale
        return scale, shift

    def __call__(self, x):
        # scale/shift derived in fp32, applied in x's dtype: fp32-affine on a
        # bf16 activation promotes the whole (B, H, W, C) intermediate to f32
        # (measured: ~840 MB f32 tensors at 640²/b128 between backbone
        # fusions — the round-3 HLO audit's top bandwidth leak)
        scale, shift = self.scale_shift()
        return x * scale.astype(x.dtype) + shift.astype(x.dtype)


def make_norm(norm: str, features: int, bn_axis_name: Optional[str] = None):
    """``get_norm`` factory parity (reference ``wrappers.py:60-88``)."""
    if norm in ("", "none", None):
        return None
    if norm == "bn":
        return nn.BatchNorm(
            use_running_average=None,
            momentum=0.9,
            epsilon=1e-5,
            axis_name=bn_axis_name,
        )
    if norm == "frozen_bn":
        return FrozenBatchNorm(features=features, name="frozen_bn")
    if norm == "gn":
        return nn.GroupNorm(num_groups=32, epsilon=1e-5)
    raise ValueError(f"Unknown norm '{norm}'")


class ConvNorm(nn.Module):
    """2-D conv with fused optional norm + activation (reference ``Conv2d``)."""

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    strides: int = 1
    dilation: int = 1
    norm: str = ""
    activation: Optional[Callable] = None
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None  # compute dtype (bfloat16 on TPU)

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel_size if isinstance(self.kernel_size, tuple) else (self.kernel_size, self.kernel_size)
        use_bias = self.norm in ("", "none", None)
        x = nn.Conv(
            features=self.features,
            kernel_size=k,
            strides=(self.strides, self.strides),
            kernel_dilation=(self.dilation, self.dilation),
            padding="SAME" if self.strides == 1 else [((ks - 1) // 2, (ks - 1) // 2) for ks in k],
            use_bias=use_bias,
            dtype=self.dtype,
            name="conv",
        )(x)
        norm = make_norm(self.norm, self.features, self.bn_axis_name)
        if norm is not None:
            if isinstance(norm, nn.BatchNorm):
                x = norm(x, use_running_average=not train)
            else:
                x = norm(x)
        if self.activation is not None:
            x = self.activation(x)
        return x
