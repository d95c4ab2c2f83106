"""Keypoint R-CNN capability: heatmap loss, decode, end-to-end forward."""

import numpy as np
import jax
import jax.numpy as jnp

from detax.models import FasterRCNN
from detax.models.roi_heads import keypoint_inference, keypoint_rcnn_loss
from detax.structures.detections import GroundTruth
from detax.structures.image_batch import ImageBatch
from tests.test_models import IMG, tiny_rcnn_conf, tiny_gt

K = 5  # synthetic keypoints: 4 corners + center


def box_keypoints(boxes: np.ndarray) -> np.ndarray:
    """(g, 4) → (g, 5, 3): corners + center, all visible."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
    pts = np.stack(
        [
            np.stack([x1, y1], -1), np.stack([x2, y1], -1),
            np.stack([x1, y2], -1), np.stack([x2, y2], -1),
            np.stack([cx, cy], -1),
        ],
        axis=1,
    )
    vis = np.ones((len(boxes), 5, 1))
    return np.concatenate([pts, vis], axis=-1).astype(np.float32)


def _kp_conf():
    conf = tiny_rcnn_conf()
    return conf.replace(
        roi=conf.roi.replace(
            keypoint_on=True,
            keypoint_rois=8,
            keypoint_head=conf.roi.keypoint_head.replace(num_keypoints=K, num_convs=2, conv_dim=32),
        )
    )


def test_keypoint_inference_decodes_argmax():
    # one ROI, 2 keypoints, peak planted at known cells
    logits = np.full((1, 1, 8, 8, 2), -5.0, np.float32)
    logits[0, 0, 2, 3, 0] = 5.0   # kp0 at cell (y=2, x=3)
    logits[0, 0, 7, 0, 1] = 7.0   # kp1 at cell (y=7, x=0)
    boxes = jnp.asarray([[[10.0, 20.0, 26.0, 36.0]]])  # 16x16 box
    out = np.asarray(keypoint_inference(jnp.asarray(logits), boxes))
    # cell centers: x = 10 + (3+0.5)*16/8 = 17, y = 20 + (2+0.5)*16/8 = 25
    np.testing.assert_allclose(out[0, 0, 0], [17.0, 25.0, 5.0], atol=1e-4)
    np.testing.assert_allclose(out[0, 0, 1], [11.0, 35.0, 7.0], atol=1e-4)


def test_keypoint_loss_prefers_correct_heatmap(rng):
    conf = _kp_conf()
    boxes = jnp.asarray([[[0.0, 0.0, 16.0, 16.0]]])
    gt_kp = jnp.asarray([[[[8.0, 8.0, 1.0]] * 1]])  # (1,1,1,3) one keypoint at center
    gt_kp = jnp.tile(gt_kp, (1, 1, K, 1))
    is_fg = jnp.ones((1, 1), bool)
    gt_index = jnp.zeros((1, 1), jnp.int32)

    good = np.full((1, 1, 56, 56, K), -3.0, np.float32)
    good[0, 0, 28, 28, :] = 6.0  # peak at the center cell
    bad = np.full((1, 1, 56, 56, K), -3.0, np.float32)
    bad[0, 0, 0, 0, :] = 6.0

    l_good = float(keypoint_rcnn_loss(conf.roi, jnp.asarray(good), gt_kp, boxes, gt_index, is_fg))
    l_bad = float(keypoint_rcnn_loss(conf.roi, jnp.asarray(bad), gt_kp, boxes, gt_index, is_fg))
    assert l_good < l_bad


def test_keypoint_rcnn_end_to_end(rng):
    conf = _kp_conf()
    model = FasterRCNN(conf=conf)
    images = ImageBatch.from_pixels(jnp.asarray(rng.randn(2, IMG, IMG, 3), jnp.float32))
    params = model.init(jax.random.PRNGKey(0), images)

    dets = model.apply(params, images)
    assert dets.keypoints is not None
    assert dets.keypoints.shape == (2, 8, K, 3)

    gt = tiny_gt()
    kps = np.stack([box_keypoints(np.asarray(gt.boxes[i])) for i in range(2)])
    gt = GroundTruth(boxes=gt.boxes, classes=gt.classes, valid=gt.valid, keypoints=jnp.asarray(kps))

    def loss_fn(p):
        losses, _ = model.apply(
            p, images, gt, method=FasterRCNN.train_forward,
            rngs={"sampling": jax.random.PRNGKey(1)},
        )
        return sum(losses.values()), losses

    (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert "loss_keypoint" in losses and np.isfinite(float(losses["loss_keypoint"]))
    kp_grads = jax.tree_util.tree_leaves(grads["params"]["roi"]["keypoint_head"])
    assert any(np.any(np.asarray(g) != 0) for g in kp_grads)