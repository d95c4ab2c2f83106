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
