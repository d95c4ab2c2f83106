"""ResNet stem (reference ``BasicStem``, ``modules/residual_blocks.py:176-224``).

7×7 stride-2 conv + norm + ReLU + 3×3 stride-2 max-pool → overall stride 4.
NHWC; padding matches torch's (3 for the conv, 1 for the pool) so imported
torchvision weights reproduce activations exactly.

TPU optimization: by default the 7×7/2 conv on 3 input channels (3/128 MXU
rows occupied — measured ~10 ms/batch at 640², half the whole backbone) is
executed as an **exact space-to-depth reparameterization**: the input is
rearranged 2×2→depth (12 channels) and the stored 7×7×3 kernel is reshaped
on the fly into the equivalent 4×4×12 kernel. Identical math (same taps,
regrouped), identical parameters (imports/checkpoints unaffected), ~4× MXU
occupancy. The classic MLPerf-ResNet trick.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from detax.nn.conv import FrozenBatchNorm, make_norm


def _space_to_depth_2x(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) → (B, H/2, W/2, 4C), channel order (py, px, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def _s2d_kernel(w7: jnp.ndarray) -> jnp.ndarray:
    """(7, 7, C, O) stride-2 kernel → (4, 4, 4C, O) stride-1 kernel on the
    space-to-depth grid.

    Output position y0 taps input rows 2*y0 + d, d ∈ [-3, 3] (pad 3). In s2d
    coordinates the tap lands in s2d-row y0 + floor(d/2) - 0 with phase d&1;
    the 4-tap window is rows y0-2 … y0+1 ⇒ stride-1 conv with asymmetric
    padding (2, 1).
    """
    k, _, c, o = w7.shape
    assert k == 7
    # tap i = dy+3 ∈ [0, 6] maps to (sy, py) = ((i+1)//2, (i+1)%2): one zero
    # row padded at the FRONT makes the (8,) tap axis reshape cleanly to
    # (4 s2d taps, 2 phases). Pure pad+reshape+transpose — the element-wise
    # `.at[sy, sx, py, px].set` form ran 49 dynamic-update-slice ops per
    # forward (params are jit arguments, so nothing folds at compile time).
    wp = jnp.pad(w7, ((1, 0), (1, 0), (0, 0), (0, 0)))  # (8, 8, C, O)
    w4 = wp.reshape(4, 2, 4, 2, c, o).transpose(0, 2, 1, 3, 4, 5)
    # match _space_to_depth_2x channel packing: (py, px, c)
    return w4.reshape(4, 4, 4 * c, o)


class BasicStem(nn.Module):
    out_channels: int = 64
    norm: str = "frozen_bn"
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    space_to_depth: bool = True  # exact reparam of the same parameters

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        # parameters stored in the canonical torch layout (7,7,C,O) no matter
        # how the conv executes — weight import and checkpoints are identical
        kernel = self.param(
            "stem_conv_kernel",
            nn.initializers.lecun_normal(),
            (7, 7, in_ch, self.out_channels),
        )
        dtype = self.dtype or x.dtype
        norm = make_norm(self.norm, self.out_channels, self.bn_axis_name)
        # frozen-BN fast path: fold the affine's SCALE into the conv kernel
        # (per-out-channel, exact in real arithmetic) and move the SHIFT +
        # ReLU AFTER the max-pool — max commutes with +const per channel and
        # with any monotone pointwise op, and float rounding is monotone, so
        # max_i r(a_i + c) == r(max_i a_i + c): the reorder is bit-exact on
        # the pooled values. Net effect: the conv output feeds the pool with
        # no intermediate elementwise pass, and the affine+ReLU run on the
        # 4×-smaller pooled tensor (saves ~2 ms/batch at 640²/b128).
        fold_affine = isinstance(norm, FrozenBatchNorm)
        shift = None
        if fold_affine:
            scale, shift = norm.scale_shift()
            kernel = kernel * scale.astype(kernel.dtype)
        if self.space_to_depth and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            xs = _space_to_depth_2x(x.astype(dtype))
            w4 = _s2d_kernel(kernel).astype(dtype)
            y = jax.lax.conv_general_dilated(
                xs, w4,
                window_strides=(1, 1),
                padding=((2, 1), (2, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(dtype), kernel.astype(dtype),
                window_strides=(2, 2),
                padding=((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if fold_affine:
            y = nn.max_pool(
                y, window_shape=(3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
            )
            return nn.relu(y + shift.astype(y.dtype))
        if norm is not None:
            if isinstance(norm, nn.BatchNorm):
                y = norm(y, use_running_average=not train)
            else:
                y = norm(y)
        y = nn.relu(y)
        return nn.max_pool(y, window_shape=(3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
