"""Differential test: detax/evaluate.py vs an independently-written oracle.

VERDICT r4 item 8: every mAP number the project publishes flows through
``detax.evaluate.DetectionEvaluator`` (pycocotools is not installed in this
environment); this test underwrites it with a separate-author brute-force
implementation (``tests/oracle_eval.py`` — no shared helpers) over
randomized scenes plus crafted ignore/area/maxDets edge cases.

Coverage counted per (class, IoU-threshold, area-range) AP cell: the suite
compares >1000 cells with in-range GT, plus full ``summarize()`` parity on
multi-image scenes.
"""

from __future__ import annotations

import numpy as np
import pytest

from detax.evaluate import COCO_AREA_RANGES, DetectionEvaluator
from tests.oracle_eval import oracle_ap, oracle_summarize

THRESHOLDS = [0.5 + 0.05 * i for i in range(10)]
RANGES = list(COCO_AREA_RANGES.values())


def _random_scene(rng, n_images, num_classes, max_gt=8, max_det=14, size=200.0):
    """Random boxes spanning the small/medium/large area buckets."""
    preds, gts = [], []
    for _ in range(n_images):
        ng = int(rng.integers(0, max_gt + 1))
        nd = int(rng.integers(0, max_det + 1))

        def boxes(n):
            xy = rng.uniform(0, size, (n, 2))
            # log-uniform extents 2..160 px: areas 4..25600 cross both the
            # 32^2=1024 and 96^2=9216 bucket boundaries
            wh = np.exp(rng.uniform(np.log(2.0), np.log(160.0), (n, 2)))
            return np.concatenate([xy, xy + wh], axis=1)

        g = boxes(ng)
        gc = rng.integers(0, num_classes, ng)
        # half the detections are perturbed copies of GT (so matches at
        # varied IoU actually occur), half are random
        d = boxes(nd)
        for i in range(nd // 2):
            if ng:
                j = int(rng.integers(0, ng))
                jitter = rng.uniform(-6, 6, 4)
                d[i] = g[j] + jitter
                d[i, 2] = max(d[i, 2], d[i, 0] + 1.0)
                d[i, 3] = max(d[i, 3], d[i, 1] + 1.0)
        dc = rng.integers(0, num_classes, nd)
        if ng and nd:
            # bias half the detection classes onto GT classes
            take = rng.integers(0, ng, nd // 2)
            dc[: nd // 2] = gc[take]
        ds = rng.uniform(0.01, 1.0, nd)
        preds.append((d, ds, dc))
        gts.append((g, gc))
    return preds, gts


def _feed(preds, gts, num_classes, max_dets=100):
    ev = DetectionEvaluator(num_classes, max_dets=max_dets)
    for (db, dsc, dcl), (gb, gcl) in zip(preds, gts):
        ev.add(db, dsc, dcl, gb, gcl)
    return ev


def _compare_cells(preds, gts, num_classes, max_dets=100):
    """Compare every (class, thresh, range) AP cell; return cells counted."""
    ev = _feed(preds, gts, num_classes, max_dets)
    o_preds = [
        (np.asarray(b).tolist(), np.asarray(s).tolist(), np.asarray(c).tolist())
        for b, s, c in preds
    ]
    o_gts = [(np.asarray(b).tolist(), np.asarray(c).tolist()) for b, c in gts]
    counted = 0
    for cls in range(num_classes):
        for t in THRESHOLDS:
            for rng_ in RANGES:
                got, n_got = ev._ap_for(cls, t, rng_)
                want, n_want = oracle_ap(o_preds, o_gts, cls, t, rng_, max_dets)
                assert n_got == n_want, (cls, t, rng_, n_got, n_want)
                if n_want == 0:
                    assert np.isnan(got) and np.isnan(want)
                    continue
                counted += 1
                assert got == pytest.approx(want, abs=1e-9), (
                    cls, t, rng_, got, want,
                )
    return counted


def test_differential_randomized_scenes():
    rng = np.random.default_rng(0)
    cells = 0
    scenes = 0
    while cells < 1000:
        scenes += 1
        num_classes = int(rng.integers(1, 5))
        preds, gts = _random_scene(rng, n_images=int(rng.integers(1, 5)), num_classes=num_classes)
        cells += _compare_cells(preds, gts, num_classes)
        assert scenes < 500, "randomized scenes not producing countable cells"
    assert cells >= 1000


def test_differential_full_summarize():
    rng = np.random.default_rng(7)
    for seed in range(3):
        num_classes = 3
        preds, gts = _random_scene(rng, n_images=6, num_classes=num_classes)
        ev = _feed(preds, gts, num_classes)
        got = ev.summarize()
        o_preds = [(b.tolist(), s.tolist(), c.tolist()) for b, s, c in preds]
        o_gts = [(b.tolist(), c.tolist()) for b, c in gts]
        want = oracle_summarize(o_preds, o_gts, num_classes)
        for key, v in want.items():
            assert got[key] == pytest.approx(v, abs=1e-9), (seed, key, got[key], v)


def test_differential_maxdets_edge():
    """>maxDets detections per image-category: the cap must bind identically."""
    rng = np.random.default_rng(11)
    g = np.array([[10.0, 10.0, 60.0, 60.0], [100.0, 100.0, 150.0, 150.0]])
    gc = np.array([0, 0])
    nd = 25
    d = np.tile(g[0], (nd, 1)) + rng.uniform(-8, 8, (nd, 4))
    ds = rng.uniform(0, 1, nd)
    dc = np.zeros(nd, np.int64)
    preds, gts = [(d, ds, dc)], [(g, gc)]
    cells = _compare_cells(preds, gts, num_classes=1, max_dets=5)
    assert cells > 0


def test_differential_ignore_area_edges():
    """GT areas exactly at the 32^2 and 96^2 inclusive bucket boundaries,
    plus detections matching only ignored GT, plus out-of-range unmatched
    detections that must be dropped rather than counted as FP."""
    g = np.array(
        [
            [0.0, 0.0, 32.0, 32.0],     # area exactly 32^2: small AND medium
            [50.0, 50.0, 146.0, 146.0], # area exactly 96^2: medium AND large
            [300.0, 300.0, 310.0, 310.0],  # area 100: small only
        ]
    )
    gc = np.array([0, 0, 0])
    # det 0 matches the small GT, det 1 matches the medium/large GT,
    # det 2 is a large unmatched box (dropped in the small range),
    # det 3 matches GT 2 at low IoU only
    d = np.array(
        [
            [1.0, 1.0, 33.0, 33.0],
            [52.0, 52.0, 148.0, 148.0],
            [400.0, 0.0, 600.0, 200.0],
            [300.0, 300.0, 312.0, 308.0],
        ]
    )
    ds = np.array([0.9, 0.8, 0.7, 0.6])
    dc = np.zeros(4, np.int64)
    preds, gts = [(d, ds, dc)], [(g, gc)]
    cells = _compare_cells(preds, gts, num_classes=1)
    assert cells > 0


def test_differential_empty_cases():
    """Empty predictions / empty GT / class absent from GT."""
    g = np.array([[10.0, 10.0, 50.0, 50.0]])
    gc = np.array([1])
    empty_b = np.zeros((0, 4))
    empty_i = np.zeros((0,), np.int64)
    empty_s = np.zeros((0,))
    preds = [(empty_b, empty_s, empty_i), (g + 1.0, np.array([0.5]), np.array([1]))]
    gts = [(g, gc), (empty_b, empty_i)]
    _compare_cells(preds, gts, num_classes=3)
