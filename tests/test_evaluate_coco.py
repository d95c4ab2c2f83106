"""COCO-exact evaluator semantics: best-unmatched-GT re-matching, maxDets
cap, and area-range ignore rules — hand-computed AP cases.

(The reference has no evaluator; these pin detax's protocol to pycocotools
semantics, fixing the round-1 deviations: argmax-only matching, no maxDets,
no area breakdown.)
"""

import numpy as np

from detax.evaluate import DetectionEvaluator


def _ev(n=1, **kw):
    return DetectionEvaluator(num_classes=n, **kw)


def test_rematch_best_unmatched_gt():
    """A detection whose best-IoU GT is already matched must still match the
    runner-up GT above threshold (COCO), not become a FP (argmax-only)."""
    ev = _ev()
    gt_a = [0.0, 0.0, 10.0, 10.0]
    gt_b = [0.0, 0.0, 12.0, 12.0]
    # det1 matches B exactly; det2 identical — best IoU is B (taken), but
    # IoU(det2, A) = 100/144 ≈ 0.694 ≥ 0.5 → matches A
    ev.add(
        pred_boxes=[[0, 0, 12, 12], [0, 0, 12, 12]],
        pred_scores=[0.9, 0.8],
        pred_classes=[0, 0],
        gt_boxes=[gt_a, gt_b],
        gt_classes=[0, 0],
    )
    m = ev.summarize(iou_thresholds=(0.5,))
    assert m["AP50"] == 1.0  # both GTs recalled at precision 1


def test_hand_computed_ap_with_fp():
    """2 GTs; TP(s=.9), FP(s=.8), TP(s=.7):
    recall [.5,.5,1], precision [1,.5,2/3] →
    101-pt AP = (51·1 + 50·(2/3)) / 101."""
    ev = _ev()
    ev.add(
        pred_boxes=[[0, 0, 10, 10], [100, 100, 110, 110], [50, 50, 60, 60]],
        pred_scores=[0.9, 0.8, 0.7],
        pred_classes=[0, 0, 0],
        gt_boxes=[[0, 0, 10, 10], [50, 50, 60, 60]],
        gt_classes=[0, 0],
    )
    m = ev.summarize(iou_thresholds=(0.5,))
    want = (51 * 1.0 + 50 * (2.0 / 3.0)) / 101
    np.testing.assert_allclose(m["AP50"], want, atol=1e-9)


def test_double_detection_second_is_fp():
    """Second detection on an already-matched single GT is a FP; with a
    second clean image the FP caps precision at the tail."""
    ev = _ev()
    # image 0: one GT, duplicate detections at scores .9/.8
    ev.add(
        pred_boxes=[[0, 0, 10, 10], [0, 0, 10, 10]],
        pred_scores=[0.9, 0.8],
        pred_classes=[0, 0],
        gt_boxes=[[0, 0, 10, 10]],
        gt_classes=[0],
    )
    # image 1: one GT, detected at the lowest score (after the dup FP)
    ev.add(
        pred_boxes=[[0, 0, 10, 10]],
        pred_scores=[0.7],
        pred_classes=[0],
        gt_boxes=[[0, 0, 10, 10]],
        gt_classes=[0],
    )
    # order: TP(.9), FP(.8 dup), TP(.7):
    # recall [.5,.5,1], precision [1,.5,2/3] — same curve as above
    m = ev.summarize(iou_thresholds=(0.5,))
    want = (51 * 1.0 + 50 * (2.0 / 3.0)) / 101
    np.testing.assert_allclose(m["AP50"], want, atol=1e-9)


def test_max_dets_cap():
    """max_dets drops the lowest-scoring detections before matching."""
    ev = _ev(max_dets=1)
    # higher-scored det is a miss; the only TP is below the cap
    ev.add(
        pred_boxes=[[100, 100, 110, 110], [0, 0, 10, 10]],
        pred_scores=[0.9, 0.8],
        pred_classes=[0, 0],
        gt_boxes=[[0, 0, 10, 10]],
        gt_classes=[0],
    )
    assert ev.summarize(iou_thresholds=(0.5,))["AP50"] == 0.0

    ev2 = _ev()  # default cap 100 keeps both → envelope precision 0.5
    ev2.add(
        pred_boxes=[[100, 100, 110, 110], [0, 0, 10, 10]],
        pred_scores=[0.9, 0.8],
        pred_classes=[0, 0],
        gt_boxes=[[0, 0, 10, 10]],
        gt_classes=[0],
    )
    # curve: FP(.9) r=0 p=0, TP(.8) r=1 p=.5 → envelope .5 at every recall
    # point incl. r=0 (pycocotools assigns recThr 0 the max precision)
    np.testing.assert_allclose(
        ev2.summarize(iou_thresholds=(0.5,))["AP50"], 0.5, atol=1e-9
    )


def test_area_range_breakdown():
    """Small/large GTs separate cleanly; matches to out-of-range GT are
    dropped from the ranking, not counted as FP."""
    ev = _ev()
    small = [0.0, 0.0, 16.0, 16.0]  # area 256 < 32²
    large = [100.0, 100.0, 200.0, 200.0]  # area 10000 > 96²
    ev.add(
        pred_boxes=[small, large],
        pred_scores=[0.9, 0.8],
        pred_classes=[0, 0],
        gt_boxes=[small, large],
        gt_classes=[0, 0],
    )
    m = ev.summarize(iou_thresholds=(0.5,))
    assert m["AP50"] == 1.0
    assert m["APs"] == 1.0  # large GT ignored, its det dropped (not FP)
    assert m["APl"] == 1.0
    assert m["APm"] == 0.0  # no medium GT → no class counted → 0


def test_unmatched_det_out_of_range_ignored():
    """An unmatched detection outside the area range must not count as FP
    for that range."""
    ev = _ev()
    small = [0.0, 0.0, 16.0, 16.0]
    ev.add(
        pred_boxes=[[300.0, 300.0, 500.0, 500.0], small],  # large FP + small TP
        pred_scores=[0.9, 0.8],
        pred_classes=[0, 0],
        gt_boxes=[small],
        gt_classes=[0],
    )
    m = ev.summarize(iou_thresholds=(0.5,))
    # "all": FP(.9) then TP(.8) → envelope precision 0.5 at every recall point
    np.testing.assert_allclose(m["AP50"], 0.5, atol=1e-9)
    # "small": the large FP is ignored → clean AP 1.0
    assert m["APs"] == 1.0


def test_ignored_gt_does_not_add_recall_burden():
    """An ignored (out-of-range) GT neither demands recall nor converts its
    matched detection into a FP."""
    ev = _ev()
    small = [0.0, 0.0, 16.0, 16.0]
    large = [100.0, 100.0, 200.0, 200.0]
    # only the small GT is detected
    ev.add(
        pred_boxes=[small],
        pred_scores=[0.9],
        pred_classes=[0],
        gt_boxes=[small, large],
        gt_classes=[0, 0],
    )
    m = ev.summarize(iou_thresholds=(0.5,))
    assert m["APs"] == 1.0  # large GT ignored entirely in the small range
    # "all": recall 0.5 → AP = 51/101
    np.testing.assert_allclose(m["AP50"], 51 / 101, atol=1e-9)
