import numpy as np
import jax.numpy as jnp
import pytest

from detax.structures.detections import Detections, GroundTruth
from detax.structures.image_batch import ImageBatch
from detax.structures.logs import HistoryBuffer, Logs


def test_detections_empty_and_concat():
    a = Detections.empty(2, 4)
    assert a.capacity == 4
    assert np.all(np.asarray(a.num_valid()) == 0)
    b = Detections(
        boxes=jnp.ones((2, 3, 4)),
        scores=jnp.ones((2, 3)),
        classes=jnp.ones((2, 3), jnp.int32),
        valid=jnp.ones((2, 3), bool),
    )
    c = Detections.concatenate([a, b])
    assert c.capacity == 7
    assert np.all(np.asarray(c.num_valid()) == 3)


def test_detections_is_pytree():
    import jax

    d = Detections.empty(1, 2)
    leaves = jax.tree_util.tree_leaves(d)
    assert len(leaves) == 4
    d2 = jax.tree_util.tree_map(lambda x: x, d)
    assert isinstance(d2, Detections)


def test_groundtruth_from_lists_pads_and_truncates():
    gt = GroundTruth.from_lists(
        [np.zeros((2, 4)), np.ones((7, 4))],
        [np.zeros(2, np.int32), np.ones(7, np.int32)],
        capacity=5,
    )
    assert gt.boxes.shape == (2, 5, 4)
    assert np.asarray(gt.num_valid()).tolist() == [2, 5]


def test_image_batch_from_pixels():
    im = ImageBatch.from_pixels(jnp.zeros((3, 32, 48, 3)))
    assert im.canvas_hw == (32, 48)
    assert np.asarray(im.image_sizes).tolist() == [[32, 48]] * 3
    assert np.asarray(im.scales).tolist() == [1, 1, 1]


def test_history_buffer():
    h = HistoryBuffer(max_length=4)
    for i in range(6):
        h.update(float(i))
    assert h.latest() == 5.0
    assert len(h.values()) == 4
    assert h.global_avg() == pytest.approx(np.mean(range(6)))
    assert h.median(3) == 4.0


def test_logs_scalars_and_smoothing():
    # the reference Logs cannot even construct (SURVEY defect M9); ours must
    logs = Logs(window_size=3)
    for i, v in enumerate([1.0, 100.0, 2.0, 3.0]):
        logs.put_scalar("rpn/num_pos_anchors", v)
        logs.step()
    latest = logs.latest()["rpn/num_pos_anchors"]
    assert latest[0] == 3.0
    smoothed = logs.latest_with_smoothing_hint()["rpn/num_pos_anchors"]
    assert smoothed[0] == 3.0  # median of [100, 2, 3]... sorted [2,3,100] -> 3
    hist = logs.history("rpn/num_pos_anchors")
    assert hist.latest() == 3.0
    with pytest.raises(KeyError):
        logs.history("nope")


def test_logs_inconsistent_smoothing_rejected():
    logs = Logs()
    logs.put_scalar("x", 1.0, smoothing_hint=True)
    with pytest.raises(ValueError):
        logs.put_scalar("x", 2.0, smoothing_hint=False)


def test_logs_put_metrics_from_device_arrays():
    logs = Logs()
    logs.put_metrics({"total_loss": jnp.asarray(1.5), "roi_head/num_fg_samples": jnp.asarray(3.0)})
    assert logs.latest()["total_loss"][0] == 1.5


def test_logs_write_jsonl(tmp_path):
    import json

    logs = Logs()
    path = str(tmp_path / "metrics.jsonl")
    for v in [1.0, 2.0]:
        logs.put_metrics({"total_loss": v})
        logs.write_jsonl(path)
        logs.step()
    rows = [json.loads(l) for l in open(path)]
    assert len(rows) == 2
    assert rows[0]["iter"] == 0 and rows[1]["iter"] == 1
    assert rows[1]["total_loss"] == 2.0
