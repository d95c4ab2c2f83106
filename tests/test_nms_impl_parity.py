"""The 'pallas' NMS path must produce the same detections as the 'xla' path
(same greedy semantics, different execution strategy)."""

import numpy as np
import jax
import jax.numpy as jnp

from detax.models import FasterRCNN
from tests.test_models import IMG, images as _images_fixture, tiny_rcnn_conf  # noqa: F401
from detax.structures.image_batch import ImageBatch


def test_faster_rcnn_pallas_nms_matches_xla(rng):
    conf_xla = tiny_rcnn_conf()
    conf_pallas = conf_xla.replace(
        rpn=conf_xla.rpn.replace(nms_impl="pallas"),
        roi=conf_xla.roi.replace(nms_impl="pallas"),
    )
    pixels = jnp.asarray(rng.randn(2, IMG, IMG, 3), jnp.float32)
    images = ImageBatch.from_pixels(pixels)

    model_x = FasterRCNN(conf=conf_xla)
    params = model_x.init(jax.random.PRNGKey(0), images)
    dets_x = model_x.apply(params, images)

    model_p = FasterRCNN(conf=conf_pallas)
    dets_p = model_p.apply(params, images)

    vx, vp = np.asarray(dets_x.valid), np.asarray(dets_p.valid)
    np.testing.assert_array_equal(vx, vp)
    # same detections; ordering by score is shared, so compare directly
    np.testing.assert_allclose(
        np.asarray(dets_x.boxes)[vx], np.asarray(dets_p.boxes)[vp], rtol=1e-5, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(dets_x.scores)[vx], np.asarray(dets_p.scores)[vp], rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(dets_x.classes)[vx], np.asarray(dets_p.classes)[vp])


def _assert_same_detections(dets_x, dets_p):
    vx, vp = np.asarray(dets_x.valid), np.asarray(dets_p.valid)
    np.testing.assert_array_equal(vx, vp)
    np.testing.assert_allclose(
        np.asarray(dets_x.boxes)[vx], np.asarray(dets_p.boxes)[vp], rtol=1e-5, atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(dets_x.classes)[vx], np.asarray(dets_p.classes)[vp])


def test_retinanet_pallas_nms_matches_xla(rng):
    from detax.configs import FPNConf, PreprocessConf, ResNetConf, RetinaNetConf
    from detax.models import RetinaNet

    base = RetinaNetConf(
        backbone=FPNConf(bottom_up=ResNetConf(stage_blocks=(1, 1, 1, 1)), out_channels=64),
        num_classes=5,
        topk_candidates=32,
        detections_per_image=8,
        score_thresh=-1.0,  # keep plenty of candidates with random weights
        preprocess=PreprocessConf(image_size=IMG),
    )
    pixels = jnp.asarray(rng.randn(2, IMG, IMG, 3), jnp.float32)
    images = ImageBatch.from_pixels(pixels)
    model_x = RetinaNet(conf=base)
    params = model_x.init(jax.random.PRNGKey(0), images)
    dets_x = model_x.apply(params, images)
    model_p = RetinaNet(conf=base.replace(nms_impl="pallas"))
    dets_p = model_p.apply(params, images)
    _assert_same_detections(dets_x, dets_p)


def test_yolo_pallas_nms_matches_xla(rng):
    from detax.configs import PreprocessConf, ResNetConf, YOLOConf
    from detax.models import YOLO

    base = YOLOConf(
        backbone=ResNetConf(stage_blocks=(1, 1, 1, 1)),
        num_classes=5,
        topk_candidates=32,
        detections_per_image=8,
        conf_thresh=0.0,
        preprocess=PreprocessConf(image_size=IMG),
    )
    pixels = jnp.asarray(rng.randn(2, IMG, IMG, 3), jnp.float32)
    images = ImageBatch.from_pixels(pixels)
    model_x = YOLO(conf=base)
    params = model_x.init(jax.random.PRNGKey(0), images)
    dets_x = model_x.apply(params, images)
    model_p = YOLO(conf=base.replace(nms_impl="pallas"))
    dets_p = model_p.apply(params, images)
    _assert_same_detections(dets_x, dets_p)
