"""Pallas NMS kernel vs the XLA/numpy oracles (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from detax.ops.nms_pallas import batched_nms_pallas, nms_keep_sorted, nms_select_pallas
from tests.oracles import greedy_nms
from tests.test_nms import clustered_boxes


def test_keep_mask_matches_greedy(rng):
    for n in (64, 130, 200):
        boxes, scores = clustered_boxes(rng, n)
        order = np.argsort(-scores)
        keep = np.asarray(
            nms_keep_sorted(jnp.asarray(boxes[order]), jnp.ones(n, bool), 0.5, interpret=True)
        )
        want = greedy_nms(boxes, scores, 0.5)
        got = order[np.where(keep)[0]].tolist()
        assert sorted(got) == sorted(want)


def test_select_matches_xla(rng):
    boxes, scores = clustered_boxes(rng, 96)
    want = greedy_nms(boxes, scores, 0.5)
    idx, ok = nms_select_pallas(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 96, interpret=True)
    got = np.asarray(idx)[np.asarray(ok)].tolist()
    assert got == want


def test_select_truncates(rng):
    boxes, scores = clustered_boxes(rng, 96)
    want = greedy_nms(boxes, scores, 0.5)[:4]
    idx, ok = nms_select_pallas(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 4, interpret=True)
    got = np.asarray(idx)[np.asarray(ok)].tolist()
    assert got == want


def test_select_respects_valid(rng):
    boxes, scores = clustered_boxes(rng, 64)
    valid = np.ones(64, bool)
    valid[::4] = False
    keep = greedy_nms(boxes[valid], scores[valid], 0.5)
    want = np.where(valid)[0][keep].tolist()
    idx, ok = nms_select_pallas(
        jnp.asarray(boxes), jnp.asarray(scores), 0.5, 64, valid=jnp.asarray(valid), interpret=True
    )
    got = np.asarray(idx)[np.asarray(ok)].tolist()
    assert got == want


def test_batched_classes_independent(rng):
    boxes, scores = clustered_boxes(rng, 48)
    classes = rng.randint(0, 3, 48)
    want = []
    for cls in range(3):
        sel = np.where(classes == cls)[0]
        kept = greedy_nms(boxes[sel], scores[sel], 0.5)
        want.extend(sel[kept].tolist())
    want = sorted(want, key=lambda i: -scores[i])
    idx, ok = batched_nms_pallas(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes), 0.5, 48, interpret=True
    )
    got = np.asarray(idx)[np.asarray(ok)].tolist()
    assert got == want


def test_multilevel_matches_per_level(rng):
    """One stacked kernel call == per-level calls, including length padding."""
    from detax.ops.nms_pallas import nms_keep_sorted_batched, nms_keep_sorted_multilevel

    b = 3
    lens = (96, 64, 30)
    boxes_l, valid_l = [], []
    for n in lens:
        bx = np.stack([clustered_boxes(rng, n)[0] for _ in range(b)])
        order = np.argsort(-rng.rand(b, n), axis=1)
        bx = np.take_along_axis(bx, order[..., None], axis=1)
        v = rng.rand(b, n) > 0.2
        boxes_l.append(jnp.asarray(bx, jnp.float32))
        valid_l.append(jnp.asarray(v))
    got = nms_keep_sorted_multilevel(boxes_l, valid_l, 0.5, interpret=True)
    for bx, v, g in zip(boxes_l, valid_l, got):
        want = nms_keep_sorted_batched(bx, v, 0.5, interpret=True)
        np.testing.assert_array_equal(np.asarray(g), np.asarray(want))
