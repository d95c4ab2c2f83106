"""Evaluator (mAP), StableHLO export, checkify validators."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from detax.evaluate import DetectionEvaluator
from detax.ops.checks import check_detections, checked
from detax.serve.export import export_inference, load_exported, stablehlo_text
from detax.structures.detections import Detections


def test_evaluator_perfect_predictions():
    ev = DetectionEvaluator(num_classes=3)
    gt = np.array([[0, 0, 10, 10], [20, 20, 40, 40]], np.float32)
    cls = np.array([0, 2])
    ev.add(gt, np.array([0.9, 0.8]), cls, gt, cls)
    m = ev.summarize()
    assert m["mAP"] == pytest.approx(1.0, abs=1e-6)
    assert m["AP50"] == pytest.approx(1.0, abs=1e-6)


def test_evaluator_no_predictions():
    ev = DetectionEvaluator(num_classes=2)
    ev.add(np.zeros((0, 4)), np.zeros(0), np.zeros(0, int),
           np.array([[0, 0, 10, 10]]), np.array([1]))
    m = ev.summarize()
    assert m["mAP"] == 0.0


def test_evaluator_half_recall():
    ev = DetectionEvaluator(num_classes=1)
    gt = np.array([[0, 0, 10, 10], [50, 50, 60, 60]], np.float32)
    # one matching prediction, one miss
    ev.add(gt[:1], np.array([0.9]), np.array([0]), gt, np.array([0, 0]))
    m = ev.summarize(iou_thresholds=[0.5])
    # perfect precision up to recall 0.5 → 101-pt AP ≈ 0.5
    assert 0.45 <= m["AP50"] <= 0.55


def test_evaluator_wrong_class_is_fp():
    ev = DetectionEvaluator(num_classes=2)
    gt = np.array([[0, 0, 10, 10]], np.float32)
    ev.add(gt, np.array([0.9]), np.array([1]), gt, np.array([0]))
    m = ev.summarize(iou_thresholds=[0.5])
    assert m["AP50"] == 0.0


def test_evaluator_localization_threshold():
    ev = DetectionEvaluator(num_classes=1)
    gt = np.array([[0, 0, 10, 10]], np.float32)
    pred = np.array([[0, 0, 10, 6]], np.float32)  # IoU 0.6
    ev.add(pred, np.array([0.9]), np.array([0]), gt, np.array([0]))
    m = ev.summarize(iou_thresholds=[0.5, 0.75])
    assert m["AP50"] == pytest.approx(1.0, abs=1e-6)
    assert m["AP75"] == 0.0


def test_evaluator_add_batch():
    from detax.structures.detections import GroundTruth

    dets = Detections(
        boxes=jnp.asarray([[[0, 0, 10, 10], [0, 0, 1, 1]]], jnp.float32),
        scores=jnp.asarray([[0.9, 0.1]]),
        classes=jnp.zeros((1, 2), jnp.int32),
        valid=jnp.asarray([[True, False]]),
    )
    gt = GroundTruth(
        boxes=jnp.asarray([[[0, 0, 10, 10]]], jnp.float32),
        classes=jnp.zeros((1, 1), jnp.int32),
        valid=jnp.ones((1, 1), bool),
    )
    ev = DetectionEvaluator(num_classes=1)
    ev.add_batch(dets, gt)
    assert ev.summarize(iou_thresholds=[0.5])["AP50"] == pytest.approx(1.0)


def test_export_roundtrip():
    def fn(x):
        return jnp.tanh(x) * 2.0

    x = jnp.arange(8.0).reshape(2, 4)
    blob = export_inference(fn, x)
    restored = load_exported(blob)
    np.testing.assert_allclose(np.asarray(restored.call(x)), np.asarray(fn(x)), rtol=1e-6)
    text = stablehlo_text(fn, x)
    assert "stablehlo" in text or "func" in text


def test_export_to_file(tmp_path):
    path = str(tmp_path / "model.bin")
    x = jnp.ones((3,))
    export_inference(lambda v: v + 1, x, path=path)
    restored = load_exported(path)
    np.testing.assert_allclose(np.asarray(restored.call(x)), 2.0)


def test_checkify_detections_pass_and_fail():
    good = Detections(
        boxes=jnp.asarray([[[0.0, 0.0, 5.0, 5.0]]]),
        scores=jnp.asarray([[1.0]]),
        classes=jnp.zeros((1, 1), jnp.int32),
        valid=jnp.ones((1, 1), bool),
    )
    err, _ = checked(check_detections)(good)
    err.throw()  # no error

    bad = Detections(
        boxes=jnp.asarray([[[5.0, 0.0, 0.0, 5.0]]]),  # x2 < x1
        scores=jnp.asarray([[1.0]]),
        classes=jnp.zeros((1, 1), jnp.int32),
        valid=jnp.ones((1, 1), bool),
    )
    err, _ = checked(check_detections)(bad)
    with pytest.raises(Exception):
        err.throw()


def test_checkify_ignores_padding():
    padded = Detections(
        boxes=jnp.asarray([[[5.0, 0.0, 0.0, jnp.inf]]]),  # garbage but invalid slot
        scores=jnp.asarray([[-jnp.inf]]),
        classes=jnp.zeros((1, 1), jnp.int32),
        valid=jnp.zeros((1, 1), bool),
    )
    err, _ = checked(check_detections)(padded)
    err.throw()  # padding must not trip checks