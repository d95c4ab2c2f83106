import numpy as np
import jax.numpy as jnp

from detax.ops.matcher import match
from tests.oracles import iou_matrix, match_oracle
from tests.test_boxes import random_boxes

RPN_THRESH, RPN_LABELS = [0.3, 0.7], [0, -1, 1]
ROI_THRESH, ROI_LABELS = [0.5], [0, 1]


def test_rpn_matcher_matches_oracle(rng):
    for _ in range(5):
        gt = random_boxes(rng, 7)
        anchors = random_boxes(rng, 50)
        q = iou_matrix(gt, anchors)
        want_idx, want_lab = match_oracle(q, RPN_THRESH, RPN_LABELS, True)
        got_idx, got_lab = match(
            jnp.asarray(q), jnp.ones(7, bool), RPN_THRESH, RPN_LABELS, True
        )
        np.testing.assert_array_equal(np.asarray(got_lab), want_lab)
        # indices must agree wherever the label isn't a tie artifact
        np.testing.assert_array_equal(np.asarray(got_idx), want_idx)


def test_roi_matcher_no_low_quality(rng):
    gt = random_boxes(rng, 4)
    props = random_boxes(rng, 30)
    q = iou_matrix(gt, props)
    want_idx, want_lab = match_oracle(q, ROI_THRESH, ROI_LABELS, False)
    got_idx, got_lab = match(jnp.asarray(q), jnp.ones(4, bool), ROI_THRESH, ROI_LABELS, False)
    np.testing.assert_array_equal(np.asarray(got_lab), want_lab)
    np.testing.assert_array_equal(np.asarray(got_idx), want_idx)


def test_low_quality_rescue():
    # One gt whose best anchor IoU (0.25) is below the fg threshold: the
    # rescue path must still label that anchor fg.
    q = np.array([[0.25, 0.1, 0.0]])
    got_idx, got_lab = match(jnp.asarray(q), jnp.ones(1, bool), RPN_THRESH, RPN_LABELS, True)
    assert np.asarray(got_lab).tolist() == [1, 0, 0]
    _, got_lab_norescue = match(jnp.asarray(q), jnp.ones(1, bool), RPN_THRESH, RPN_LABELS, False)
    assert np.asarray(got_lab_norescue).tolist() == [0, 0, 0]


def test_rescue_includes_ties():
    q = np.array([[0.4, 0.4, 0.1]])
    _, lab = match(jnp.asarray(q), jnp.ones(1, bool), RPN_THRESH, RPN_LABELS, True)
    # both 0.4 anchors tie for the gt's max → rescued to fg; 0.1 < 0.3 → bg
    assert np.asarray(lab).tolist() == [1, 1, 0]


def test_padded_gt_rows_ignored(rng):
    gt = random_boxes(rng, 3)
    anchors = random_boxes(rng, 40)
    q_real = iou_matrix(gt, anchors)
    # pad with 2 fake rows of huge quality; gt_valid masks them out
    q_pad = np.concatenate([q_real, np.full((2, 40), 0.99)], axis=0)
    valid = np.array([True, True, True, False, False])
    got_idx, got_lab = match(jnp.asarray(q_pad), jnp.asarray(valid), RPN_THRESH, RPN_LABELS, True)
    want_idx, want_lab = match_oracle(q_real, RPN_THRESH, RPN_LABELS, True)
    np.testing.assert_array_equal(np.asarray(got_lab), want_lab)
    np.testing.assert_array_equal(np.asarray(got_idx), want_idx)


def test_zero_valid_gt_all_background(rng):
    # matches reference empty-matrix early exit (matcher.py:68-78)
    q = np.asarray(iou_matrix(random_boxes(rng, 2), random_boxes(rng, 10)))
    got_idx, got_lab = match(jnp.asarray(q), jnp.zeros(2, bool), RPN_THRESH, RPN_LABELS, True)
    assert np.all(np.asarray(got_lab) == RPN_LABELS[0])
    assert np.all(np.asarray(got_idx) == 0)


def test_batched_via_vmap(rng):
    import jax

    gts = np.stack([random_boxes(rng, 5) for _ in range(4)])
    anchors = np.stack([random_boxes(rng, 20) for _ in range(4)])
    q = np.stack([iou_matrix(gts[i], anchors[i]) for i in range(4)])
    valid = np.ones((4, 5), bool)
    fn = jax.vmap(lambda qq, vv: match(qq, vv, RPN_THRESH, RPN_LABELS, True))
    got_idx, got_lab = fn(jnp.asarray(q), jnp.asarray(valid))
    for i in range(4):
        want_idx, want_lab = match_oracle(q[i], RPN_THRESH, RPN_LABELS, True)
        np.testing.assert_array_equal(np.asarray(got_lab[i]), want_lab)
        np.testing.assert_array_equal(np.asarray(got_idx[i]), want_idx)
