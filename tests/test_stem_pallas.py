"""Fused Pallas stem (s2d conv + affine + ReLU + 3×3/2 max-pool) vs the XLA
stem composition — interpret mode on CPU."""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from detax.nn.stem import _s2d_kernel, _space_to_depth_2x
from detax.ops.stem_pallas import fused_stem


def _ref(xs, w4, scale, bias):
    y = jax.lax.conv_general_dilated(
        xs, w4, (1, 1), ((2, 1), (2, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    y = nn.relu(y * scale + bias)
    return nn.max_pool(y, (3, 3), (2, 2), ((1, 1), (1, 1)))


def test_fused_stem_matches_xla_path(rng):
    B, S = 2, 128
    x = jnp.asarray(rng.randn(B, S, S, 3), jnp.float32)
    k7 = jnp.asarray(rng.randn(7, 7, 3, 64) * 0.1, jnp.float32)
    scale = jnp.asarray(rng.rand(64) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(64) * 0.1, jnp.float32)
    xs = _space_to_depth_2x(x)
    w4 = _s2d_kernel(k7)
    want = np.asarray(_ref(xs, w4, scale, bias))
    got = np.asarray(fused_stem(xs, w4, scale, bias, interpret=True))
    assert got.shape == (B, S // 4, S // 4, 64)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_fused_stem_identity_affine_and_rect(rng):
    # non-square input + identity norm (norm="" stems)
    B, H, W = 1, 64, 96
    x = jnp.asarray(rng.randn(B, H, W, 3), jnp.float32)
    k7 = jnp.asarray(rng.randn(7, 7, 3, 64) * 0.1, jnp.float32)
    ident = jnp.ones((64,), jnp.float32)
    zero = jnp.zeros((64,), jnp.float32)
    xs = _space_to_depth_2x(x)
    w4 = _s2d_kernel(k7)
    want = np.asarray(_ref(xs, w4, ident, zero))
    got = np.asarray(fused_stem(xs, w4, ident, zero, interpret=True))
    assert got.shape == (B, H // 4, W // 4, 64)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
