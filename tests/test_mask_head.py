"""Mask R-CNN capability: GT mask cropping, mask loss, end-to-end forward."""

import numpy as np
import jax
import jax.numpy as jnp

from detax.models import FasterRCNN
from detax.models.roi_heads import crop_gt_masks, mask_inference
from detax.structures.detections import GroundTruth
from detax.structures.image_batch import ImageBatch
from detax.train.coco import rasterize_box_masks
from tests.test_models import IMG, tiny_rcnn_conf, tiny_gt


def test_rasterize_box_masks():
    m = rasterize_box_masks(np.array([[8.0, 8.0, 24.0, 16.0]]), (32, 32), stride=4)
    assert m.shape == (1, 8, 8)
    # cells with centers inside [8,24)x[8,16): x cells 2..5, y cells 2..3
    assert m[0, 2:4, 2:6].all()
    assert m[0].sum() == 8


def test_rasterize_device_matches_host(rng):
    """The jitted on-device rasterizer (--feed cached --masks) is bit-equal
    to the host numpy one over random batched boxes."""
    from detax.train.coco import rasterize_box_masks_device

    size, stride = 64, 4
    boxes = np.stack(
        [
            np.sort(rng.uniform(0, size, (16, 2)), axis=-1),  # x1 < x2
            np.sort(rng.uniform(0, size, (16, 2)), axis=-1),  # y1 < y2
        ],
        axis=-1,
    ).reshape(16, 4)[:, [0, 2, 1, 3]]  # → xyxy
    host = np.stack([rasterize_box_masks(boxes[i : i + 4], (size, size), stride) for i in (0, 4, 8, 12)])
    dev = np.asarray(
        jax.jit(
            lambda b: rasterize_box_masks_device(b, (size, size), stride)
        )(jnp.asarray(boxes.reshape(4, 4, 4), jnp.float32))
    )
    np.testing.assert_array_equal(host, dev)


def test_cached_gather_rasterizes_masks():
    """make_cached_gather(mask_spec) attaches device-rasterized bitmaps that
    match the host rect_masks feed for the same items."""
    from detax.configs.detector import PreprocessConf
    from detax.train.coco import (
        SyntheticCOCO,
        build_device_cache,
        make_batches,
        make_cached_gather,
    )

    pconf = PreprocessConf(image_size=64)
    ds = SyntheticCOCO(num_images=4, image_size=64, num_classes=3, seed=7)
    cache_images, cache_gt = build_device_cache(ds, pconf, max_gt_boxes=8)
    gather = make_cached_gather(mask_spec=(64, pconf.mask_stride))
    images, gt = gather(cache_images, cache_gt, np.arange(4, dtype=np.int32))
    assert gt.masks is not None and gt.masks.shape[:2] == (4, 8)
    host_images, host_gt = next(
        make_batches(ds, 4, pconf, max_gt_boxes=8, epochs=1, rect_masks=True, shuffle=False)
    )
    np.testing.assert_array_equal(
        np.asarray(gt.masks) * np.asarray(gt.valid)[:, :, None, None].astype(np.uint8),
        np.asarray(host_gt.masks),
    )


def test_crop_gt_masks_full_box_is_ones(rng):
    size, stride = 64, 4
    boxes = np.array([[[8.0, 8.0, 40.0, 40.0]]], np.float32)  # (1,1,4)
    bitmaps = rasterize_box_masks(boxes[0], (size, size), stride)[None]  # (1,1,16,16)
    crop = np.asarray(
        crop_gt_masks(jnp.asarray(bitmaps), stride, jnp.asarray(boxes), jnp.zeros((1, 1), jnp.int32), (28, 28))
    )
    # cropping the mask over its own box: interior ≈ 1
    assert crop.shape == (1, 1, 28, 28)
    assert crop[0, 0, 4:-4, 4:-4].min() > 0.9


def test_crop_selects_matched_instance(rng):
    size, stride = 64, 4
    b0 = [0.0, 0.0, 32.0, 32.0]
    b1 = [32.0, 32.0, 64.0, 64.0]
    bitmaps = rasterize_box_masks(np.array([b0, b1]), (size, size), stride)[None]  # (1,2,16,16)
    boxes = jnp.asarray([[b1]], jnp.float32)
    crop = np.asarray(
        crop_gt_masks(jnp.asarray(bitmaps), stride, boxes, jnp.asarray([[1]], jnp.int32), (14, 14))
    )
    assert crop[0, 0, 2:-2, 2:-2].min() > 0.9  # instance 1 covers its own box
    crop0 = np.asarray(
        crop_gt_masks(jnp.asarray(bitmaps), stride, boxes, jnp.zeros((1, 1), jnp.int32), (14, 14))
    )
    assert crop0.max() < 0.1  # instance 0 doesn't overlap b1


def _mask_conf():
    conf = tiny_rcnn_conf()
    return conf.replace(roi=conf.roi.replace(mask_on=True, mask_rois=8))


def test_mask_rcnn_inference_shapes(rng):
    conf = _mask_conf()
    model = FasterRCNN(conf=conf)
    images = ImageBatch.from_pixels(jnp.asarray(rng.randn(2, IMG, IMG, 3), jnp.float32))
    params = model.init(jax.random.PRNGKey(0), images)
    dets = model.apply(params, images)
    assert dets.mask_logits is not None
    assert dets.mask_logits.shape == (2, 8, 28, 28)  # detections_per_image=8


def test_mask_rcnn_train_loss_and_grads(rng):
    conf = _mask_conf()
    model = FasterRCNN(conf=conf)
    images = ImageBatch.from_pixels(jnp.asarray(rng.randn(2, IMG, IMG, 3), jnp.float32))
    params = model.init(jax.random.PRNGKey(0), images)

    gt = tiny_gt()
    boxes = np.asarray(gt.boxes)
    masks = np.stack(
        [rasterize_box_masks(boxes[i], (IMG, IMG), 4) for i in range(2)]
    )
    gt = GroundTruth(
        boxes=gt.boxes, classes=gt.classes, valid=gt.valid, masks=jnp.asarray(masks)
    )

    def loss_fn(p):
        losses, _ = model.apply(
            p, images, gt, method=FasterRCNN.train_forward,
            rngs={"sampling": jax.random.PRNGKey(1)},
        )
        return sum(losses.values()), losses

    (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert "loss_mask" in losses
    assert np.isfinite(float(losses["loss_mask"]))
    mask_grads = jax.tree_util.tree_leaves(grads["params"]["roi"]["mask_head"])
    assert any(np.any(np.asarray(g) != 0) for g in mask_grads)


def test_mask_inference_selects_class():
    logits = jnp.stack(
        [jnp.zeros((1, 2, 4, 4)), jnp.ones((1, 2, 4, 4))], axis=-1
    )  # class 0 → 0, class 1 → 1
    out = np.asarray(mask_inference(logits, jnp.asarray([[0, 1]]), 2))
    assert out[0, 0].max() == 0.0
    assert out[0, 1].min() == 1.0
