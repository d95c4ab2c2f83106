import numpy as np
import jax
import jax.numpy as jnp

from detax.ops.nms import batched_nms, nms_select, suppression_mask
from tests.oracles import greedy_nms
from tests.test_boxes import random_boxes


def clustered_boxes(rng, n, n_clusters=6, size=200.0):
    """Boxes clustered so NMS actually suppresses."""
    centers = rng.uniform(20, size - 20, (n_clusters, 2))
    idx = rng.randint(0, n_clusters, n)
    c = centers[idx] + rng.randn(n, 2) * 3
    wh = rng.uniform(10, 30, (n, 2)) / 2
    boxes = np.concatenate([c - wh, c + wh], axis=1).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    return boxes, scores


def test_nms_select_matches_greedy(rng):
    for trial in range(5):
        boxes, scores = clustered_boxes(rng, 64)
        want = greedy_nms(boxes, scores, 0.5)
        idx, ok = nms_select(jnp.asarray(boxes), jnp.asarray(scores), 0.5, max_out=64)
        got = np.asarray(idx)[np.asarray(ok)].tolist()
        assert got == want


def test_nms_select_truncation(rng):
    boxes, scores = clustered_boxes(rng, 128)
    want = greedy_nms(boxes, scores, 0.5)
    k = min(5, len(want))
    idx, ok = nms_select(jnp.asarray(boxes), jnp.asarray(scores), 0.5, max_out=5)
    got = np.asarray(idx)[np.asarray(ok)].tolist()
    assert got == want[:k]


def test_nms_select_respects_valid_mask(rng):
    boxes, scores = clustered_boxes(rng, 40)
    valid = np.ones(40, bool)
    valid[::3] = False
    want = greedy_nms(boxes[valid], scores[valid], 0.5)
    want_orig = np.where(valid)[0][want].tolist()
    idx, ok = nms_select(
        jnp.asarray(boxes), jnp.asarray(scores), 0.5, max_out=40, valid=jnp.asarray(valid)
    )
    got = np.asarray(idx)[np.asarray(ok)].tolist()
    assert got == want_orig


def test_suppression_mask_matches_greedy(rng):
    boxes, scores = clustered_boxes(rng, 50)
    want = sorted(greedy_nms(boxes, scores, 0.5))
    keep = np.asarray(suppression_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
    assert sorted(np.where(keep)[0].tolist()) == want


def test_batched_nms_classes_dont_interact(rng):
    boxes, scores = clustered_boxes(rng, 60)
    classes = rng.randint(0, 3, 60)
    # oracle: per-class greedy, merged and re-sorted by score
    want = []
    for c in range(3):
        sel = np.where(classes == c)[0]
        kept = greedy_nms(boxes[sel], scores[sel], 0.5)
        want.extend(sel[kept].tolist())
    want = sorted(want, key=lambda i: -scores[i])
    idx, ok = batched_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes), 0.5, max_out=60
    )
    got = np.asarray(idx)[np.asarray(ok)].tolist()
    assert got == want


def test_nms_all_invalid():
    boxes = jnp.zeros((8, 4))
    scores = jnp.zeros((8,))
    idx, ok = nms_select(boxes, scores, 0.5, max_out=8, valid=jnp.zeros(8, bool))
    assert not np.asarray(ok).any()


def test_nms_jit_vmap(rng):
    all_boxes, all_scores = [], []
    for _ in range(4):
        b, s = clustered_boxes(rng, 32)
        all_boxes.append(b)
        all_scores.append(s)
    bb, ss = np.stack(all_boxes), np.stack(all_scores)
    fn = jax.jit(jax.vmap(lambda b, s: nms_select(b, s, 0.5, max_out=32)))
    idx, ok = fn(jnp.asarray(bb), jnp.asarray(ss))
    for i in range(4):
        want = greedy_nms(bb[i], ss[i], 0.5)
        got = np.asarray(idx[i])[np.asarray(ok[i])].tolist()
        assert got == want
