"""Detection evaluation: COCO-style mean average precision.

The reference ships no evaluator at all (SURVEY.md §0 — no train loop, no
metrics consumer); a detection framework needs one to close the fine-tune
loop (BASELINE config 5). This is a self-contained numpy implementation of
the standard protocol: per-class greedy matching of score-ranked detections
against ground truth at an IoU threshold, 101-point interpolated AP,
averaged over classes (and over IoU 0.5:0.95 for COCO mAP).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np


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


class DetectionEvaluator:
    """Accumulate per-image predictions + GT, then compute AP/mAP.

    Usage:
      ev = DetectionEvaluator(num_classes)
      ev.add(pred_boxes, pred_scores, pred_classes, gt_boxes, gt_classes)  # per image
      metrics = ev.summarize()   # {"mAP", "AP50", "AP75", "AP50/<cls>"...}
    """

    def __init__(self, num_classes: int):
        self.num_classes = num_classes
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
        self._preds.append(
            (np.asarray(pred_boxes, np.float64).reshape(-1, 4),
             np.asarray(pred_scores, np.float64).reshape(-1),
             np.asarray(pred_classes, np.int64).reshape(-1), i)
        )
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

    def _ap_for(self, cls: int, iou_thresh: float) -> Tuple[float, int]:
        # collect detections of this class over all images, sorted by score
        recs = []
        for boxes, scores, classes, img in self._preds:
            sel = classes == cls
            for b, s in zip(boxes[sel], scores[sel]):
                recs.append((s, img, b))
        recs.sort(key=lambda r: -r[0])

        gt_by_img: Dict[int, np.ndarray] = {}
        matched: Dict[int, np.ndarray] = {}
        total_gt = 0
        for boxes, classes, img in self._gts:
            sel = classes == cls
            gt_by_img[img] = boxes[sel]
            matched[img] = np.zeros(sel.sum(), bool)
            total_gt += int(sel.sum())

        if total_gt == 0:
            return float("nan"), 0

        tp = np.zeros(len(recs))
        fp = np.zeros(len(recs))
        for k, (score, img, box) in enumerate(recs):
            gts = gt_by_img.get(img, np.zeros((0, 4)))
            if len(gts) == 0:
                fp[k] = 1
                continue
            ious = _iou_matrix(box[None], gts)[0]
            best = int(np.argmax(ious))
            if ious[best] >= iou_thresh and not matched[img][best]:
                matched[img][best] = True
                tp[k] = 1
            else:
                fp[k] = 1
        ctp = np.cumsum(tp)
        cfp = np.cumsum(fp)
        recall = ctp / total_gt
        precision = ctp / np.maximum(ctp + cfp, 1e-9)
        return _average_precision(recall, precision), total_gt

    def summarize(self, iou_thresholds: Sequence[float] = tuple(np.arange(0.5, 1.0, 0.05))) -> Dict[str, float]:
        per_thresh: Dict[float, List[float]] = {t: [] for t in iou_thresholds}
        for cls in range(self.num_classes):
            for t in iou_thresholds:
                ap, n = self._ap_for(cls, t)
                if n > 0:
                    per_thresh[t].append(ap)
        means = {t: (float(np.mean(v)) if v else 0.0) for t, v in per_thresh.items()}
        out = {"mAP": float(np.mean(list(means.values()))) if means else 0.0}
        if 0.5 in means:
            out["AP50"] = means[0.5]
        t75 = min(iou_thresholds, key=lambda t: abs(t - 0.75))
        if abs(t75 - 0.75) < 1e-6:
            out["AP75"] = means[t75]
        return out
