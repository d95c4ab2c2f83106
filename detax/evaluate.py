"""Detection evaluation: COCO-exact mean average precision.

The reference ships no evaluator at all (SURVEY.md §0 — no train loop, no
metrics consumer); a detection framework needs one to close the fine-tune
loop (BASELINE config 5). This is a self-contained numpy implementation of
the COCO protocol, matching pycocotools semantics:

- per-class greedy matching in score order; each detection matches the
  highest-IoU **not-yet-matched** ground truth at or above the threshold
  (not merely its best-IoU GT — a detection whose best GT was already taken
  can still match the runner-up);
- a ``maxDets`` cap (COCO: 100) on score-ranked detections applied per
  image-category (pycocotools ``useCats=1`` caps inside ``evaluateImg``,
  which runs per (image, category) pair);
- area-range breakdowns (all / small / medium / large) with pycocotools'
  exact bounds — inclusive at BOTH ends, so an area of exactly 32² counts
  as both small and medium — and COCO ignore semantics: out-of-range GT is
  ignored (doesn't count toward recall, and detections matched to it are
  dropped from the ranking), and unmatched detections whose own area is out
  of range are likewise dropped;
- 101-point interpolated AP, averaged over classes present in the GT, and
  over IoU 0.5:0.95 for mAP.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# pycocotools areaRng values: bounds are INCLUSIVE at both ends
COCO_AREA_RANGES: Dict[str, Tuple[float, float]] = {
    "all": (0.0, 1e5**2),
    "small": (0.0, 32.0**2),
    "medium": (32.0**2, 96.0**2),
    "large": (96.0**2, 1e5**2),
}


def _iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return np.where(inter > 0, inter / np.maximum(union, 1e-9), 0.0)


def _average_precision(recall: np.ndarray, precision: np.ndarray) -> float:
    """101-point interpolated AP (COCO protocol)."""
    if recall.size == 0:
        return 0.0
    # precision envelope
    mprec = np.concatenate([[0.0], precision, [0.0]])
    mrec = np.concatenate([[0.0], recall, [1.0]])
    for i in range(len(mprec) - 2, -1, -1):
        mprec[i] = max(mprec[i], mprec[i + 1])
    points = np.linspace(0, 1, 101)
    idx = np.searchsorted(mrec, points, side="left")
    return float(np.mean(mprec[np.minimum(idx, len(mprec) - 1)]))


def _box_area(b: np.ndarray) -> np.ndarray:
    return (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])


class DetectionEvaluator:
    """Accumulate per-image predictions + GT, then compute AP/mAP.

    Usage:
      ev = DetectionEvaluator(num_classes)
      ev.add(pred_boxes, pred_scores, pred_classes, gt_boxes, gt_classes)  # per image
      metrics = ev.summarize()   # {"mAP", "AP50", "AP75", "APs", "APm", "APl"}
    """

    def __init__(self, num_classes: int, max_dets: int = 100):
        self.num_classes = num_classes
        self.max_dets = max_dets
        self._preds: List[Tuple[np.ndarray, np.ndarray, np.ndarray, int]] = []
        self._gts: List[Tuple[np.ndarray, np.ndarray, int]] = []
        self._image_id = 0

    def add(
        self,
        pred_boxes: np.ndarray,
        pred_scores: np.ndarray,
        pred_classes: np.ndarray,
        gt_boxes: np.ndarray,
        gt_classes: np.ndarray,
    ) -> None:
        i = self._image_id
        self._image_id += 1
        boxes = np.asarray(pred_boxes, np.float64).reshape(-1, 4)
        scores = np.asarray(pred_scores, np.float64).reshape(-1)
        classes = np.asarray(pred_classes, np.int64).reshape(-1)
        # (the maxDets cap is applied per image-category inside _ap_for,
        # matching pycocotools useCats=1 — NOT per image here)
        self._preds.append((boxes, scores, classes, i))
        self._gts.append(
            (np.asarray(gt_boxes, np.float64).reshape(-1, 4),
             np.asarray(gt_classes, np.int64).reshape(-1), i)
        )

    def add_batch(self, detections, gt) -> None:
        """Accumulate a detax Detections/GroundTruth batch (device arrays ok)."""
        boxes = np.asarray(detections.boxes)
        scores = np.asarray(detections.scores)
        classes = np.asarray(detections.classes)
        valid = np.asarray(detections.valid)
        g_boxes = np.asarray(gt.boxes)
        g_classes = np.asarray(gt.classes)
        g_valid = np.asarray(gt.valid)
        for i in range(boxes.shape[0]):
            m, gm = valid[i], g_valid[i]
            self.add(boxes[i][m], scores[i][m], classes[i][m], g_boxes[i][gm], g_classes[i][gm])

    def _ap_for(
        self, cls: int, iou_thresh: float, area_range: Tuple[float, float]
    ) -> Tuple[float, int]:
        """COCO AP for one class / IoU threshold / area range.

        Returns (AP, number of counted GT); AP is nan when no GT in range.
        """
        lo, hi = area_range
        # per-image GT for this class + its in-range (non-ignored) flags
        gt_by_img: Dict[int, np.ndarray] = {}
        gt_ignore: Dict[int, np.ndarray] = {}
        matched: Dict[int, np.ndarray] = {}
        total_gt = 0
        for boxes, classes, img in self._gts:
            sel = classes == cls
            g = boxes[sel]
            ign = ~((_box_area(g) >= lo) & (_box_area(g) <= hi))
            gt_by_img[img] = g
            gt_ignore[img] = ign
            matched[img] = np.zeros(len(g), bool)
            total_gt += int((~ign).sum())

        if total_gt == 0:
            return float("nan"), 0

        recs = []
        for boxes, scores, classes, img in self._preds:
            sel = classes == cls
            b_c, s_c = boxes[sel], scores[sel]
            # pycocotools maxDets cap: top-scoring per image-CATEGORY
            if len(s_c) > self.max_dets:
                keep = np.argsort(-s_c, kind="stable")[: self.max_dets]
                b_c, s_c = b_c[keep], s_c[keep]
            for b, s in zip(b_c, s_c):
                recs.append((s, img, b))
        recs.sort(key=lambda r: -r[0])

        tp, fp = [], []
        for score, img, box in recs:
            gts = gt_by_img.get(img)
            best = -1
            if gts is not None and len(gts):
                ious = _iou_matrix(box[None], gts)[0]
                # best *unmatched* GT at/above threshold; unignored GTs take
                # absolute precedence over ignored ones (pycocotools scans
                # unignored-first and stops at the ignored region once any
                # unignored match exists)
                for phase_ignored in (False, True):
                    best_iou = iou_thresh - 1e-10
                    for g in range(len(gts)):
                        if matched[img][g] or gt_ignore[img][g] != phase_ignored:
                            continue
                        if ious[g] > best_iou:
                            best, best_iou = g, ious[g]
                    if best >= 0:
                        break
            if best >= 0:
                matched[img][best] = True
                if gt_ignore[img][best]:
                    continue  # matched an ignored GT → drop from ranking
                tp.append(1.0)
                fp.append(0.0)
            else:
                # unmatched detection whose own area is out of range → ignore
                a = float(_box_area(box[None])[0])
                if not (lo <= a <= hi):
                    continue
                tp.append(0.0)
                fp.append(1.0)

        ctp = np.cumsum(tp) if tp else np.zeros(0)
        cfp = np.cumsum(fp) if fp else np.zeros(0)
        recall = ctp / total_gt
        precision = ctp / np.maximum(ctp + cfp, 1e-9)
        return _average_precision(recall, precision), total_gt

    def _mean_ap(
        self,
        iou_thresholds: Sequence[float],
        area_range: Tuple[float, float],
    ) -> Dict[float, float]:
        per_thresh: Dict[float, List[float]] = {t: [] for t in iou_thresholds}
        for cls in range(self.num_classes):
            for t in iou_thresholds:
                ap, n = self._ap_for(cls, t, area_range)
                if n > 0:
                    per_thresh[t].append(ap)
        return {t: (float(np.mean(v)) if v else 0.0) for t, v in per_thresh.items()}

    def summarize(
        self,
        iou_thresholds: Sequence[float] = tuple(np.arange(0.5, 1.0, 0.05)),
        area_ranges: Optional[Dict[str, Tuple[float, float]]] = None,
    ) -> Dict[str, float]:
        means = self._mean_ap(iou_thresholds, COCO_AREA_RANGES["all"])
        out = {"mAP": float(np.mean(list(means.values()))) if means else 0.0}
        if 0.5 in means:
            out["AP50"] = means[0.5]
        t75 = min(iou_thresholds, key=lambda t: abs(t - 0.75))
        if abs(t75 - 0.75) < 1e-6:
            out["AP75"] = means[t75]
        ranges = area_ranges if area_ranges is not None else COCO_AREA_RANGES
        for key, suffix in (("small", "APs"), ("medium", "APm"), ("large", "APl")):
            if key in ranges:
                m = self._mean_ap(iou_thresholds, ranges[key])
                out[suffix] = float(np.mean(list(m.values()))) if m else 0.0
        return out
