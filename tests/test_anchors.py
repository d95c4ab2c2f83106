"""Anchor generation: grid constants + arithmetic index reconstruction.

The reconstruction path (detax/nn/anchors.py::anchors_from_indices) must be
bit-identical to indexing the grid constant — it replaces the (B, k) HBM
gather in RPN selection (reference find_top_rpn_proposals keeps full anchor
tensors around, models/utils.py:47-65; on TPU the gather is the cost)."""

import jax
import jax.numpy as jnp
import numpy as np

from detax.configs import FasterRCNNConf
from detax.nn.anchors import anchors_from_indices, grid_anchors


def test_anchors_from_indices_matches_grid():
    conf = FasterRCNNConf().rpn
    ag = conf.anchor_generator
    shapes = [(160, 160), (80, 80), (40, 40), (20, 20), (5, 10)]
    strides = [4, 8, 16, 32, 64]
    grids = grid_anchors(shapes, strides, ag.sizes, ag.aspect_ratios, ag.offset)
    sizes_b = list(ag.sizes) if len(ag.sizes) == len(shapes) else list(ag.sizes) * len(shapes)
    ars_b = (
        list(ag.aspect_ratios)
        if len(ag.aspect_ratios) == len(shapes)
        else list(ag.aspect_ratios) * len(shapes)
    )
    rng = np.random.RandomState(0)
    for lvl, (shape, stride, grid) in enumerate(zip(shapes, strides, grids)):
        n = grid.shape[0]
        idx = jnp.asarray(rng.randint(0, n, (3, 64)), jnp.int32)
        rec = anchors_from_indices(idx, shape, stride, sizes_b[lvl], ars_b[lvl], ag.offset)
        gathered = jnp.take(grid, idx, axis=0)
        np.testing.assert_array_equal(np.asarray(rec), np.asarray(gathered))


def test_anchors_from_indices_under_jit_edge_indices():
    conf = FasterRCNNConf().rpn
    ag = conf.anchor_generator
    shape, stride = (40, 40), 16
    grid = grid_anchors([shape], [stride], [ag.sizes[0]], ag.aspect_ratios, ag.offset)[0]
    n = grid.shape[0]
    idx = jnp.asarray([[0, 1, 2, n - 1, n - 2, n // 2]], jnp.int32)
    f = jax.jit(
        lambda i: anchors_from_indices(
            i, shape, stride, ag.sizes[0], ag.aspect_ratios[0], ag.offset
        )
    )
    np.testing.assert_array_equal(np.asarray(f(idx)), np.asarray(jnp.take(grid, idx, axis=0)))
