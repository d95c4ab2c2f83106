"""Independent numpy oracles for detection ops.

These re-state the *mathematical definitions* (greedy NMS, bilinear ROIAlign
with torchvision's border conventions, IoU, delta encode/decode, the
Detectron-style matcher) directly in numpy so detax's XLA/Pallas
implementations are tested against a second, independently-written
implementation — the automated version of the reference repo's
"compare against detectron2" oracle pattern (SURVEY.md §4).
"""

from __future__ import annotations

import math

import numpy as np


def iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    out = np.zeros_like(inter)
    pos = inter > 0
    out[pos] = inter[pos] / union[pos]
    return out


def greedy_nms(boxes: np.ndarray, scores: np.ndarray, iou_threshold: float) -> list:
    """Plain greedy NMS: suppress IoU strictly greater than threshold."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(int(i))
        ious = iou_matrix(boxes[i : i + 1], boxes)[0]
        suppressed |= ious > iou_threshold
        suppressed[i] = True
    return keep


def match_oracle(quality: np.ndarray, thresholds, labels, allow_low_quality):
    """Reference Matcher semantics (matcher.py:53-120) in numpy."""
    m, n = quality.shape
    if m == 0:
        return np.zeros(n, np.int64), np.full(n, labels[0], np.int8)
    matched_vals = quality.max(axis=0)
    matches = quality.argmax(axis=0)
    match_labels = np.full(n, 1, np.int8)
    bounds = [-math.inf] + list(thresholds) + [math.inf]
    for label, low, high in zip(labels, bounds[:-1], bounds[1:]):
        sel = (matched_vals >= low) & (matched_vals < high)
        match_labels[sel] = label
    if allow_low_quality:
        highest_per_gt = quality.max(axis=1)
        _, pred_idx = np.nonzero(quality == highest_per_gt[:, None])
        # the reference relies on qualities being positive; replicate the
        # positive-max guard used by detax
        rows, cols = np.nonzero((quality == highest_per_gt[:, None]) & (highest_per_gt[:, None] > 0))
        match_labels[cols] = 1
    return matches, match_labels


def encode_deltas(src: np.ndarray, tgt: np.ndarray, weights=(1, 1, 1, 1)) -> np.ndarray:
    sw = src[:, 2] - src[:, 0]
    sh = src[:, 3] - src[:, 1]
    scx = src[:, 0] + 0.5 * sw
    scy = src[:, 1] + 0.5 * sh
    tw = tgt[:, 2] - tgt[:, 0]
    th = tgt[:, 3] - tgt[:, 1]
    tcx = tgt[:, 0] + 0.5 * tw
    tcy = tgt[:, 1] + 0.5 * th
    wx, wy, ww, wh = weights
    return np.stack(
        [
            wx * (tcx - scx) / sw,
            wy * (tcy - scy) / sh,
            ww * np.log(tw / sw),
            wh * np.log(th / sh),
        ],
        axis=1,
    )


def decode_deltas(deltas: np.ndarray, boxes: np.ndarray, weights=(1, 1, 1, 1), scale_clamp=math.log(1000.0 / 16)) -> np.ndarray:
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    cx = boxes[:, 0] + 0.5 * w
    cy = boxes[:, 1] + 0.5 * h
    wx, wy, ww, wh = weights
    dx, dy, dw, dh = deltas[:, 0] / wx, deltas[:, 1] / wy, deltas[:, 2] / ww, deltas[:, 3] / wh
    dw = np.minimum(dw, scale_clamp)
    dh = np.minimum(dh, scale_clamp)
    pcx = dx * w + cx
    pcy = dy * h + cy
    pw = np.exp(dw) * w
    ph = np.exp(dh) * h
    return np.stack([pcx - pw / 2, pcy - ph / 2, pcx + pw / 2, pcy + ph / 2], axis=1)


def _bilinear(feat: np.ndarray, y: float, x: float) -> np.ndarray:
    """torchvision bilinear_interpolate (C last)."""
    h, w = feat.shape[:2]
    if y < -1.0 or y > h or x < -1.0 or x > w:
        return np.zeros(feat.shape[-1], feat.dtype)
    y = max(y, 0.0)
    x = max(x, 0.0)
    y_low = int(y)
    x_low = int(x)
    if y_low >= h - 1:
        y_high = y_low = h - 1
        y = float(y_low)
    else:
        y_high = y_low + 1
    if x_low >= w - 1:
        x_high = x_low = w - 1
        x = float(x_low)
    else:
        x_high = x_low + 1
    ly, lx = y - y_low, x - x_low
    hy, hx = 1 - ly, 1 - lx
    return (
        hy * hx * feat[y_low, x_low]
        + hy * lx * feat[y_low, x_high]
        + ly * hx * feat[y_high, x_low]
        + ly * lx * feat[y_high, x_high]
    )


def roi_align_oracle(
    feat: np.ndarray,
    boxes: np.ndarray,
    spatial_scale: float,
    output_size=(7, 7),
    sampling_ratio=2,
    aligned=True,
) -> np.ndarray:
    """torchvision roi_align semantics, (H, W, C) features."""
    ph, pw = output_size
    n = boxes.shape[0]
    c = feat.shape[-1]
    out = np.zeros((n, ph, pw, c), np.float32)
    offset = 0.5 if aligned else 0.0
    for i in range(n):
        x1 = boxes[i, 0] * spatial_scale - offset
        y1 = boxes[i, 1] * spatial_scale - offset
        x2 = boxes[i, 2] * spatial_scale - offset
        y2 = boxes[i, 3] * spatial_scale - offset
        roi_w, roi_h = x2 - x1, y2 - y1
        if not aligned:
            roi_w, roi_h = max(roi_w, 1.0), max(roi_h, 1.0)
        bin_h, bin_w = roi_h / ph, roi_w / pw
        # torchvision sampling_ratio=0 means *adaptive*: per-box, per-axis
        # ceil(bin size) samples (roi_poolers.py:64-71 default)
        ry = sampling_ratio if sampling_ratio > 0 else max(1, math.ceil(bin_h))
        rx = sampling_ratio if sampling_ratio > 0 else max(1, math.ceil(bin_w))
        for py in range(ph):
            for px in range(pw):
                acc = np.zeros(c, np.float64)
                for iy in range(ry):
                    yy = y1 + py * bin_h + (iy + 0.5) * bin_h / ry
                    for ix in range(rx):
                        xx = x1 + px * bin_w + (ix + 0.5) * bin_w / rx
                        acc += _bilinear(feat, yy, xx)
                out[i, py, px] = acc / (ry * rx)
    return out
