import numpy as np
import jax.numpy as jnp

from detax.ops.roi_align import (
    assign_boxes_to_levels,
    multiscale_roi_align,
    roi_align,
    roi_pool,
)
from tests.oracles import roi_align_oracle


def _boxes_in(rng, n, size):
    xy = rng.uniform(0, size * 0.6, (n, 2))
    wh = rng.uniform(4, size * 0.4, (n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def test_roi_align_matches_torchvision_semantics(rng):
    feat = rng.randn(24, 32, 8).astype(np.float32)
    boxes = _boxes_in(rng, 12, 24 * 4)
    got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(boxes), 0.25, (7, 7), 2, True))
    want = roi_align_oracle(feat, boxes, 0.25, (7, 7), 2, True)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_roi_align_unaligned_legacy(rng):
    feat = rng.randn(16, 16, 4).astype(np.float32)
    boxes = _boxes_in(rng, 6, 64)
    got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(boxes), 0.25, (7, 7), 2, False))
    want = roi_align_oracle(feat, boxes, 0.25, (7, 7), 2, False)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_roi_align_border_boxes(rng):
    # boxes partially outside the feature map exercise the -1/size border rules
    feat = rng.randn(10, 10, 2).astype(np.float32)
    boxes = np.array(
        [
            [-8.0, -8.0, 12.0, 12.0],
            [30.0, 30.0, 45.0, 45.0],
            [0.0, 0.0, 40.0, 40.0],
        ],
        np.float32,
    )
    got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(boxes), 0.25, (7, 7), 2, True))
    want = roi_align_oracle(feat, boxes, 0.25, (7, 7), 2, True)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_level_assignment():
    # FPN eqn 1: canonical 224px box → level 4; half size → level 3 (roi_poolers.py:103-131)
    boxes = jnp.asarray(
        [
            [0.0, 0.0, 224.0, 224.0],
            [0.0, 0.0, 112.0, 112.0],
            [0.0, 0.0, 448.0, 448.0],
            [0.0, 0.0, 8.0, 8.0],       # clamps to min level
            [0.0, 0.0, 4096.0, 4096.0], # clamps to max level
        ]
    )
    lv = np.asarray(assign_boxes_to_levels(boxes, 2, 5, 224, 4))
    assert lv.tolist() == [4, 3, 5, 2, 5]


def test_multiscale_matches_per_level(rng):
    b = 2
    strides = [4, 8, 16, 32]
    feats = [rng.randn(b, 160 // (s // 4), 160 // (s // 4), 8).astype(np.float32) for s in strides]
    boxes = np.stack([_boxes_in(rng, 10, 500) for _ in range(b)])
    got = np.asarray(
        multiscale_roi_align(
            [jnp.asarray(f) for f in feats], jnp.asarray(boxes), strides, (7, 7), 2, True
        )
    )
    lv = np.asarray(assign_boxes_to_levels(jnp.asarray(boxes), 2, 5, 224, 4))
    for i in range(b):
        for j in range(10):
            l = int(lv[i, j]) - 2
            want = roi_align_oracle(feats[l][i], boxes[i, j : j + 1], 1.0 / strides[l], (7, 7), 2, True)
            np.testing.assert_allclose(got[i, j], want[0], rtol=1e-4, atol=1e-4)


def test_roi_pool_is_max(rng):
    # constant feature inside the ROI: max-pool must return that constant
    feat = np.zeros((16, 16, 1), np.float32)
    feat[4:12, 4:12] = 5.0
    boxes = np.array([[16.0, 16.0, 48.0, 48.0]], np.float32)  # maps to [4,12) at scale .25
    got = np.asarray(roi_pool(jnp.asarray(feat), jnp.asarray(boxes), 0.25, (2, 2)))
    np.testing.assert_allclose(got, 5.0)
