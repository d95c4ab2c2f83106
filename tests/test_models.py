"""End-to-end model tests at tiny sizes (compile-friendly on CPU)."""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from detax.configs import (
    FasterRCNNConf,
    FPNConf,
    PreprocessConf,
    ResNetConf,
    RegionProposalNetworkConf,
    RetinaNetConf,
    ROIConf,
    YOLOConf,
)
from detax.configs.roi import ROIPoolerConf, BoxHeadConf
from detax.models import FPN, FasterRCNN, ResNet, RetinaNet, YOLO
from detax.structures.detections import GroundTruth
from detax.structures.image_batch import ImageBatch

IMG = 64  # tiny canvas; all strides divide it


def tiny_rcnn_conf():
    return FasterRCNNConf(
        backbone=FPNConf(bottom_up=ResNetConf(stage_blocks=(1, 1, 1, 1))),
        rpn=RegionProposalNetworkConf(
            pre_nms_topk=(64, 32), post_nms_topk=(32, 16), batch_size_per_image=32
        ),
        roi=ROIConf(
            batch_size_per_image=16,
            num_classes=7,
            box_head=BoxHeadConf(num_fc=1, fc_dim=64),
            box_pooler=ROIPoolerConf(output_size=(7, 7)),
            detections_per_image=8,
            pre_nms_candidates=64,
        ),
        preprocess=PreprocessConf(image_size=IMG),
        max_gt_boxes=5,
    )


def tiny_gt(batch=2, g=5):
    rng = np.random.RandomState(3)
    boxes = []
    classes = []
    for _ in range(batch):
        xy = rng.uniform(0, IMG / 2, (3, 2))
        wh = rng.uniform(8, IMG / 2, (3, 2))
        boxes.append(np.concatenate([xy, xy + wh], 1).clip(0, IMG))
        classes.append(rng.randint(0, 7, 3))
    return GroundTruth.from_lists(boxes, classes, g)


@pytest.fixture(scope="module")
def images():
    rng = np.random.RandomState(0)
    return ImageBatch.from_pixels(jnp.asarray(rng.randn(2, IMG, IMG, 3), jnp.float32))


def test_resnet_shapes(images):
    conf = ResNetConf(stage_blocks=(1, 1, 1, 1))
    model = ResNet(conf=conf)
    params = model.init(jax.random.PRNGKey(0), images.pixels)
    out = model.apply(params, images.pixels)
    assert set(out) == {"res1", "res2", "res3", "res4"}
    for i, name in enumerate(["res1", "res2", "res3", "res4"]):
        s = 4 * 2**i
        assert out[name].shape == (2, IMG // s, IMG // s, 64 * 2**i), name


def test_resnet50_bottleneck_shapes(images):
    conf = ResNetConf(stage_blocks=(1, 1, 1, 1), bottleneck=True)
    model = ResNet(conf=conf)
    params = model.init(jax.random.PRNGKey(0), images.pixels)
    out = model.apply(params, images.pixels)
    assert out["res4"].shape == (2, IMG // 32, IMG // 32, 512 * 4)


def test_resnet_classifier_head(images):
    conf = ResNetConf(stage_blocks=(1, 1, 1, 1), num_classes=10)
    model = ResNet(conf=conf)
    params = model.init(jax.random.PRNGKey(0), images.pixels)
    out = model.apply(params, images.pixels)
    assert out["logits"].shape == (2, 10)


def test_fpn_shapes(images):
    conf = FPNConf(bottom_up=ResNetConf(stage_blocks=(1, 1, 1, 1)))
    model = FPN(conf=conf)
    params = model.init(jax.random.PRNGKey(0), images.pixels)
    out = model.apply(params, images.pixels)
    # reference contract: p1..p4 strides 4..32, p5 stride 64, all 64-channel
    assert list(out) == ["p1", "p2", "p3", "p4", "p5"]
    for name, stride in zip(["p1", "p2", "p3", "p4", "p5"], [4, 8, 16, 32, 64]):
        assert out[name].shape == (2, IMG // stride, IMG // stride, 64), name


def test_faster_rcnn_inference(images):
    conf = tiny_rcnn_conf()
    model = FasterRCNN(conf=conf)
    params = model.init(jax.random.PRNGKey(0), images)
    dets = jax.jit(lambda p, im: model.apply(p, im))(params, images)
    assert dets.boxes.shape == (2, 8, 4)
    assert dets.scores.shape == (2, 8)
    assert np.all(np.isfinite(np.asarray(dets.boxes)))
    # boxes inside canvas
    b = np.asarray(dets.boxes)[np.asarray(dets.valid)]
    if b.size:
        assert b.min() >= 0 and b.max() <= IMG


def test_faster_rcnn_train_forward(images):
    conf = tiny_rcnn_conf()
    model = FasterRCNN(conf=conf)
    params = model.init(jax.random.PRNGKey(0), images)
    gt = tiny_gt()

    def loss_fn(p):
        losses, metrics = model.apply(
            p, images, gt, method=FasterRCNN.train_forward,
            rngs={"sampling": jax.random.PRNGKey(7)},
        )
        return sum(losses.values()), (losses, metrics)

    (total, (losses, metrics)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(total))
    assert set(losses) == {"loss_rpn_cls", "loss_rpn_loc", "loss_cls", "loss_box_reg"}
    assert "rpn/num_pos_anchors" in metrics and "roi_head/num_fg_samples" in metrics
    # gradients flow and are finite
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(np.any(np.asarray(l) != 0) for l in leaves)


def test_retinanet_forward(images):
    conf = RetinaNetConf(
        backbone=FPNConf(bottom_up=ResNetConf(stage_blocks=(1, 1, 1, 1)), out_channels=64),
        num_classes=7,
        topk_candidates=32,
        detections_per_image=8,
        preprocess=PreprocessConf(image_size=IMG),
    )
    model = RetinaNet(conf=conf)
    params = model.init(jax.random.PRNGKey(0), images)
    dets = model.apply(params, images)
    assert dets.boxes.shape == (2, 8, 4)
    losses, metrics = model.apply(params, images, tiny_gt(), method=RetinaNet.train_forward)
    assert np.isfinite(float(sum(losses.values())))

    # anchor-first selection (serving option): valid detections, classes in
    # range, and its per-anchor-best candidates are a subset of the exact
    # flat candidates when k covers everything (both reduce to all anchors)
    model_a = RetinaNet(conf=conf.replace(topk_impl="anchor"))
    dets_a = model_a.apply(params, images)
    assert dets_a.boxes.shape == (2, 8, 4)
    va = np.asarray(dets_a.valid)
    ca = np.asarray(dets_a.classes)
    assert ((ca[va] >= 0) & (ca[va] < 7)).all()
    sa = np.asarray(dets_a.scores)
    assert np.isfinite(sa[va]).all()
    # the top detection (a clear argmax anchor) agrees with the exact path
    if va[0].any() and np.asarray(dets.valid)[0].any():
        from tests.oracles import iou_matrix

        b0 = np.asarray(dets.boxes)[0, 0][None]
        a0 = np.asarray(dets_a.boxes)[0, 0][None]
        assert iou_matrix(b0, a0)[0, 0] > 0.99


def test_retinanet_two_stage_matches_flat():
    """two_stage selection with exact stage top-ks reproduces the flat
    top-k candidate set: if (a, c) ranks in the flat top-k, fewer than k
    anchors have a best-class score above anchor a's, so a survives the
    anchor stage (detax/models/retinanet.py topk_impl='two_stage')."""
    rng = np.random.RandomState(7)
    b, r, nc, k = 3, 500, 11, 40
    lg = rng.randn(b, r, nc).astype(np.float32)

    # flat exact top-k candidate set
    flat = lg.reshape(b, r * nc)
    flat_idx = np.argsort(-flat, axis=1)[:, :k]

    # two-stage with exact selections
    best = lg.max(axis=-1)
    a_top = np.argsort(-best, axis=1)[:, :k]
    for i in range(b):
        sub = lg[i, a_top[i]].reshape(-1)  # (k·nc,)
        two_idx = np.argsort(-sub)[:k]
        two_set = {(a_top[i][j // nc], j % nc) for j in two_idx}
        flat_set = {(j // nc, j % nc) for j in flat_idx[i]}
        assert two_set == flat_set


def test_retinanet_two_stage_model_matches_exact(images):
    """Model-level: on CPU approx_max_k lowers to an exact sort, so the
    two_stage path must produce the same detections as the exact flat path."""
    conf = RetinaNetConf(
        backbone=FPNConf(bottom_up=ResNetConf(stage_blocks=(1, 1, 1, 1)), out_channels=64),
        num_classes=7,
        topk_candidates=32,
        detections_per_image=8,
        preprocess=PreprocessConf(image_size=IMG),
    )
    model = RetinaNet(conf=conf)
    params = model.init(jax.random.PRNGKey(0), images)
    dets = model.apply(params, images)
    dets2 = RetinaNet(conf=conf.replace(topk_impl="two_stage")).apply(params, images)
    np.testing.assert_array_equal(np.asarray(dets.valid), np.asarray(dets2.valid))
    v = np.asarray(dets.valid)
    np.testing.assert_allclose(
        np.asarray(dets.boxes)[v], np.asarray(dets2.boxes)[v], rtol=0, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(dets.classes)[v], np.asarray(dets2.classes)[v])


def test_yolo_forward(images):
    conf = YOLOConf(
        backbone=ResNetConf(stage_blocks=(1, 1, 1, 1)),
        num_classes=7,
        topk_candidates=32,
        detections_per_image=8,
        preprocess=PreprocessConf(image_size=IMG),
    )
    model = YOLO(conf=conf)
    params = model.init(jax.random.PRNGKey(0), images)
    dets = model.apply(params, images)
    assert dets.boxes.shape == (2, 8, 4)
    losses, metrics = model.apply(params, images, tiny_gt(), method=YOLO.train_forward)
    assert np.isfinite(float(sum(losses.values())))


def test_config_json_roundtrip(tmp_path):
    conf = tiny_rcnn_conf()
    path = str(tmp_path / "conf.json")
    conf.save(path)
    loaded = FasterRCNNConf.load(path)
    assert loaded == conf


def test_yolo_select_before_decode_matches_decode_all(images):
    # round-3 restructure: the model scores/top-ks BEFORE decoding boxes
    # (decode runs on the k winners only, grid/prior rebuilt from indices).
    # The score never depended on the decode, so the candidate set and the
    # decoded values must be IDENTICAL to the decode-everything oracle.
    conf = YOLOConf(
        backbone=ResNetConf(stage_blocks=(1, 1, 1, 1)),
        num_classes=7,
        topk_candidates=16,
        detections_per_image=8,
        preprocess=PreprocessConf(image_size=IMG),
    )
    model = YOLO(conf=conf)
    params = model.init(jax.random.PRNGKey(3), images)
    raw, hws = model.apply(params, images, False, method=YOLO._forward_raw)

    cand_boxes, cand_scores, cand_classes = [], [], []
    for lvl, (r, (h, w)) in enumerate(zip(raw, hws)):
        r = np.asarray(r, np.float32)
        anchors_wh = np.asarray(conf.head.anchors[lvl], np.float32)
        a = anchors_wh.shape[0]
        stride = conf.head.strides[lvl]
        b, rr, _ = r.shape

        def sig(x):
            return 1.0 / (1.0 + np.exp(-x))

        # oracle: decode EVERY anchor, then select
        gy, gx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        grid = np.stack([gx, gy], -1)[:, :, None, :].repeat(a, 2).reshape(1, rr, 2)
        prior = np.broadcast_to(anchors_wh[None, None], (h, w, a, 2)).reshape(1, rr, 2)
        cxy = (sig(r[..., 0:2]) + grid) * stride
        wh = prior * np.exp(np.clip(r[..., 2:4], None, 8.0))
        boxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], -1)
        best = r[..., 5:].max(-1)
        cls = r[..., 5:].argmax(-1)
        score = sig(r[..., 4]) * sig(best)
        order = np.argsort(-score, axis=1, kind="stable")[:, :16]
        cand_boxes.append(np.take_along_axis(boxes, order[..., None], 1))
        cand_scores.append(np.take_along_axis(score, order, 1))
        cand_classes.append(np.take_along_axis(cls, order, 1))

    # model candidates: re-run the model's own selection loop via __call__
    # up to NMS is not exposed, so compare through identical NMS instead
    from detax.ops.nms import multiclass_nms
    from detax.structures import boxes as box_ops

    boxes = np.concatenate(cand_boxes, 1)
    scores = np.concatenate(cand_scores, 1).astype(np.float32)
    classes = np.concatenate(cand_classes, 1).astype(np.int32)
    boxes = np.asarray(
        box_ops.clip(jnp.asarray(boxes, jnp.float32), images.image_sizes[:, 0:1], images.image_sizes[:, 1:2])
    )
    valid = (scores > conf.conf_thresh) & np.asarray(
        box_ops.nonempty(jnp.asarray(boxes))
    )
    db, ds, dc, ok = multiclass_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
        conf.nms_thresh, conf.detections_per_image, jnp.asarray(valid), impl="xla",
    )

    dets = model.apply(params, images)
    np.testing.assert_allclose(
        np.asarray(dets.boxes), np.asarray(db), rtol=1e-5, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(dets.scores), np.asarray(ds), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(dets.classes), np.asarray(dc))


def test_stem_affine_fold_matches_reference_order():
    """Folded stem (scale-in-kernel, shift+ReLU after pool) == the reference
    op order conv -> frozen-BN affine -> ReLU -> maxpool (exact up to f32
    rounding of the kernel scaling; the pool/shift reorder is bit-exact by
    monotonicity)."""
    import flax.linen as nn_
    import jax
    import jax.numpy as jnp

    from detax.nn.stem import BasicStem

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 64, 64, 3), jnp.float32)
    stem = BasicStem(out_channels=16, norm="frozen_bn")
    params = jax.jit(stem.init)(jax.random.PRNGKey(0), x)
    # non-trivial frozen stats (negative scales included via weight sign)
    p = jax.tree_util.tree_map(lambda a: a, params)["params"]
    fb = dict(p["frozen_bn"])
    fb["weight"] = jnp.asarray(rng.randn(16), jnp.float32)
    fb["bias"] = jnp.asarray(rng.randn(16), jnp.float32)
    fb["running_mean"] = jnp.asarray(rng.randn(16), jnp.float32)
    fb["running_var"] = jnp.asarray(rng.rand(16) + 0.5, jnp.float32)
    p = {**p, "frozen_bn": fb}

    got = stem.apply({"params": p}, x)

    # reference order, built from the same parameters
    scale = fb["weight"] * jax.lax.rsqrt(fb["running_var"] + 1e-5)
    shift = fb["bias"] - fb["running_mean"] * scale
    y = jax.lax.conv_general_dilated(
        x, p["stem_conv_kernel"], (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = nn_.relu(y * scale + shift)
    want = nn_.max_pool(y, window_shape=(3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)
