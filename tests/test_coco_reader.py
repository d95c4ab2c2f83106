"""Real-COCO-format end-to-end coverage: a tiny COCO instances JSON + JPEGs
written on the fly drive COCOReader → make_batches → train step → evaluator
(BASELINE config 5's data path; the reference has no dataset code at all).
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from detax.configs.detector import PreprocessConf
from detax.evaluate import DetectionEvaluator
from detax.train.coco import COCOReader, make_batches, prefetch_batches

PIL = pytest.importorskip("PIL.Image")


@pytest.fixture(scope="module")
def coco_dir(tmp_path_factory):
    """4 JPEG images of mixed sizes + COCO-format annotations (sparse
    category ids, one iscrowd annotation that must be dropped)."""
    root = tmp_path_factory.mktemp("coco")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    sizes = [(120, 160), (90, 140), (100, 100), (160, 120)]
    images, annotations = [], []
    ann_id = 1
    for i, (h, w) in enumerate(sizes):
        arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        # paint one solid rectangle per annotation so boxes mean something
        n_obj = 1 + i % 2
        for j in range(n_obj):
            bw, bh = w // 3, h // 3
            x, y = (j * w) // 3, (j * h) // 3
            arr[y : y + bh, x : x + bw] = [(50 + 80 * j) % 255, 200, 90]
            annotations.append({
                "id": ann_id,
                "image_id": 10 + i,
                "category_id": [7, 21][j % 2],  # sparse ids
                "bbox": [float(x), float(y), float(bw), float(bh)],  # xywh
                "area": float(bw * bh),
                "iscrowd": 0,
            })
            ann_id += 1
        fname = f"img_{i}.jpg"
        PIL.fromarray(arr).save(img_dir / fname, quality=92)
        images.append({"id": 10 + i, "file_name": fname, "height": h, "width": w})
    # a crowd annotation the reader must filter out
    annotations.append({
        "id": ann_id, "image_id": 10, "category_id": 7,
        "bbox": [1.0, 1.0, 5.0, 5.0], "area": 25.0, "iscrowd": 1,
    })
    ann = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": 7, "name": "thing"}, {"id": 21, "name": "other"}],
    }
    path = root / "instances.json"
    path.write_text(json.dumps(ann))
    return str(path), str(img_dir)


def test_reader_parses_format(coco_dir):
    ann, imgs = coco_dir
    reader = COCOReader(ann, imgs)
    assert len(reader) == 4
    img, boxes, classes = reader.get(0)
    assert img.ndim == 3 and img.shape[2] == 3
    # image 0 has exactly one (non-crowd) annotation; crowd was dropped
    assert boxes.shape == (1, 4) and classes.shape == (1,)
    assert classes[0] == 0  # sparse id 7 → contiguous 0
    x1, y1, x2, y2 = boxes[0]
    assert x2 > x1 and y2 > y1  # xywh → xyxy conversion
    # second image: two objects, classes {0, 1}
    _, b2, c2 = reader.get(1)
    assert b2.shape == (2, 4) and set(c2.tolist()) == {0, 1}


def test_reader_batches_letterbox_geometry(coco_dir):
    ann, imgs = coco_dir
    reader = COCOReader(ann, imgs)
    size = 64
    it = make_batches(reader, 2, PreprocessConf(image_size=size), max_gt_boxes=8, epochs=1)
    images, gt = next(it)
    assert images.pixels.shape == (2, size, size, 3)
    sizes = np.asarray(images.image_sizes)
    assert (sizes <= size).all() and (sizes > 0).all()
    # GT boxes live inside the valid letterboxed region
    boxes = np.asarray(gt.boxes)
    valid = np.asarray(gt.valid)
    for b in range(2):
        vb = boxes[b][valid[b]]
        assert len(vb) >= 1
        assert (vb[:, 2] <= sizes[b, 1] + 1e-3).all()
        assert (vb[:, 3] <= sizes[b, 0] + 1e-3).all()


@pytest.fixture(scope="module")
def tiny_detector():
    from detax.models import FasterRCNN
    from tests.test_models import tiny_rcnn_conf

    conf = tiny_rcnn_conf()
    return FasterRCNN(conf=conf), conf


def test_coco_end_to_end_train_step_and_eval(coco_dir, tiny_detector):
    """COCO-format data through the full loop: batches → jitted train step
    (loss finite, decreases over a few steps on this 4-image set) →
    inference → DetectionEvaluator."""
    ann, imgs = coco_dir
    model, conf = tiny_detector
    size = conf.preprocess.image_size

    reader = COCOReader(ann, imgs)
    batches = prefetch_batches(
        make_batches(reader, 2, conf.preprocess, max_gt_boxes=conf.max_gt_boxes)
    )
    images, gt = next(batches)

    from detax.train.step import make_train_step
    from detax.train.train_state import create_train_state

    params = jax.jit(model.init)(jax.random.PRNGKey(0), images)
    state, tx = create_train_state(params, learning_rate=0.02)
    step = make_train_step(model, tx, augment=False)

    losses = []
    for _ in range(4):
        images, gt = next(batches)
        state, metrics = step(state, images, gt)
        losses.append(float(metrics["total_loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0] * 1.5  # moving, not diverging

    dets = jax.jit(lambda p, im: model.apply(p, im))(state.params, images)
    ev = DetectionEvaluator(num_classes=conf.roi.num_classes)
    ev.add_batch(dets, gt)
    m = ev.summarize()
    assert set(m) >= {"mAP", "AP50", "AP75", "APs", "APm", "APl"}
    assert np.isfinite(m["mAP"])


def test_device_cache_matches_dataset():
    """The device-resident cache holds exactly the dataset's canvases + GT;
    on-device gather assembles the same batch the host feed would build."""
    import jax.numpy as jnp

    from detax.configs.detector import PreprocessConf
    from detax.train.coco import (
        SyntheticCOCO,
        build_device_cache,
        cached_index_batches,
        make_cached_gather,
    )

    ds = SyntheticCOCO(num_images=6, image_size=64, num_classes=5, cache=True)
    images, gt = build_device_cache(ds, PreprocessConf(image_size=64), max_gt_boxes=8)
    assert images.pixels.shape == (6, 64, 64, 3) and images.pixels.dtype == jnp.uint8

    gather = make_cached_gather()
    bi, bgt = gather(images, gt, np.asarray([4, 1], np.int32))
    for row, di in enumerate([4, 1]):
        img, boxes, classes = ds.get(di)
        np.testing.assert_array_equal(np.asarray(bi.pixels[row]), img)
        g = len(boxes)
        np.testing.assert_allclose(np.asarray(bgt.boxes[row, :g]), boxes)
        np.testing.assert_array_equal(np.asarray(bgt.classes[row, :g]), classes)
        assert bool(np.all(np.asarray(bgt.valid[row, :g])))
        assert not bool(np.any(np.asarray(bgt.valid[row, g:])))

    # index stream covers the dataset each epoch
    it = cached_index_batches(6, 2, seed=0)
    seen = np.concatenate([next(it) for _ in range(3)])
    assert sorted(seen.tolist()) == list(range(6))
