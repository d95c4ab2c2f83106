"""Independent brute-force COCO-AP oracle for differential-testing detax/evaluate.py.

AUTHOR-SEPARATE by design (VERDICT r4 item 8): this file shares NO helpers
with detax.evaluate — IoU, matching, and interpolation are written from the
COCO protocol description (pycocotools cocoeval semantics), deliberately in
a different style (scalar loops, max-over-recall-suffix interpolation) so a
bug in one implementation is unlikely to be mirrored in the other.

Protocol implemented (useCats=1):
  * detections ranked globally per (class, IoU thresh, area range) by
    descending score — stable in accumulation order on ties;
  * each detection greedily matches the strictly-highest-IoU not-yet-matched
    GT of its class in its image at IoU >= thresh, preferring any unignored
    GT over every ignored one;
  * GT outside the area range is "ignored": it never counts toward recall,
    and a detection matched to it is dropped from the ranking entirely;
  * an unmatched detection whose own area is outside the range is dropped;
  * per image-category maxDets cap on score-ranked detections;
  * AP = mean over 101 recall points r of max{precision at ranks with
    recall >= r} (0 where unreachable); class AP is nan when the class has
    no in-range GT anywhere and is excluded from the mean.
"""

from __future__ import annotations


def _iou_scalar(a, b) -> float:
    ix1 = max(a[0], b[0])
    iy1 = max(a[1], b[1])
    ix2 = min(a[2], b[2])
    iy2 = min(a[3], b[3])
    iw = ix2 - ix1
    ih = iy2 - iy1
    if iw <= 0.0 or ih <= 0.0:
        return 0.0
    inter = iw * ih
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    area_b = (b[2] - b[0]) * (b[3] - b[1])
    denom = area_a + area_b - inter
    if denom < 1e-9:
        denom = 1e-9
    return inter / denom


def _area(b) -> float:
    return (b[2] - b[0]) * (b[3] - b[1])


def oracle_ap(preds, gts, cls, iou_thresh, area_range, max_dets=100):
    """AP for one (class, IoU threshold, area range).

    preds: list of (boxes NxA list, scores list, classes list) per image.
    gts:   list of (boxes list, classes list) per image.
    Returns (ap, n_counted_gt); ap is nan when n_counted_gt == 0.
    """
    lo, hi = area_range

    # per-image class-filtered GT with ignore flags
    gt_img = []
    total_gt = 0
    for boxes, classes in gts:
        rows = []
        for b, c in zip(boxes, classes):
            if int(c) != cls:
                continue
            a = _area(b)
            ignored = not (lo <= a <= hi)
            rows.append({"box": b, "ignored": ignored, "matched": False})
            if not ignored:
                total_gt += 1
        gt_img.append(rows)

    if total_gt == 0:
        return float("nan"), 0

    # rank detections: per image-category maxDets cap first, then global
    # descending-score stable order (accumulation order breaks ties)
    ranked = []
    order = 0
    for img, (boxes, scores, classes) in enumerate(preds):
        rows = [
            (float(s), list(b))
            for b, s, c in zip(boxes, scores, classes)
            if int(c) == cls
        ]
        # stable top-maxDets by score (survivors kept in descending-score
        # stable order, which is how they enter the global ranking)
        idx = sorted(range(len(rows)), key=lambda i: -rows[i][0])[:max_dets]
        for i in idx:
            ranked.append((rows[i][0], order, img, rows[i][1]))
            order += 1
    ranked.sort(key=lambda r: (-r[0], r[1]))

    flags = []  # True = TP, False = FP (dropped detections never appended)
    for score, _, img, box in ranked:
        rows = gt_img[img]
        choice = -1
        for want_ignored in (False, True):
            best_iou = iou_thresh - 1e-10
            for g, row in enumerate(rows):
                if row["matched"] or row["ignored"] != want_ignored:
                    continue
                v = _iou_scalar(box, row["box"])
                if v > best_iou:
                    best_iou = v
                    choice = g
            if choice >= 0:
                break
        if choice >= 0:
            rows[choice]["matched"] = True
            if rows[choice]["ignored"]:
                continue  # drop from ranking
            flags.append(True)
        else:
            a = _area(box)
            if not (lo <= a <= hi):
                continue  # drop out-of-range unmatched detection
            flags.append(False)

    # precision/recall at each rank
    recalls, precisions = [], []
    tp = 0
    for k, is_tp in enumerate(flags):
        if is_tp:
            tp += 1
        recalls.append(tp / total_gt)
        precisions.append(tp / (k + 1))

    # 101-point interpolation: max precision over ranks with recall >= r.
    # The grid itself is protocol (COCO's np.linspace(0,1,101)) — a shared
    # constant, not shared logic; exact float grid values matter when a
    # recall value sits 1 ulp from a grid point.
    import numpy as _np

    grid = _np.linspace(0.0, 1.0, 101)
    total = 0.0
    for r in grid:
        best = 0.0
        for rec, prec in zip(recalls, precisions):
            if rec >= r and prec > best:
                best = prec
        total += best
    return total / 101.0, total_gt


def oracle_summarize(preds, gts, num_classes, max_dets=100):
    """Full COCO summary via oracle_ap — mirrors the public metric names."""
    thresholds = [0.5 + 0.05 * i for i in range(10)]
    ranges = {
        "all": (0.0, 1e10),
        "small": (0.0, 32.0**2),
        "medium": (32.0**2, 96.0**2),
        "large": (96.0**2, 1e10),
    }

    def mean_over(area_range):
        per_t = {t: [] for t in thresholds}
        for cls in range(num_classes):
            for t in thresholds:
                ap, n = oracle_ap(preds, gts, cls, t, area_range, max_dets)
                if n > 0:
                    per_t[t].append(ap)
        return {
            t: (sum(v) / len(v) if v else 0.0) for t, v in per_t.items()
        }

    means = mean_over(ranges["all"])
    out = {
        "mAP": sum(means.values()) / len(means),
        "AP50": means[0.5],
        "AP75": means[0.75],
    }
    for key, name in (("small", "APs"), ("medium", "APm"), ("large", "APl")):
        m = mean_over(ranges[key])
        out[name] = sum(m.values()) / len(m)
    return out
