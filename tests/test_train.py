"""Training tier: augmentation, optimizer/frozen masking, mesh train step,
checkpointing, synthetic data pipeline."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from detax.configs.detector import PreprocessConf
from detax.structures.detections import GroundTruth
from detax.structures.image_batch import ImageBatch
from detax.train.augment import augment_batch, hflip
from detax.train.coco import SyntheticCOCO, make_batches
from detax.train.train_state import create_train_state, frozen_bn_mask, make_optimizer


def _batch(rng, b=2, size=32):
    pixels = jnp.asarray(rng.randn(b, size, size, 3), jnp.float32)
    images = ImageBatch.from_pixels(pixels)
    gt = GroundTruth.from_lists(
        [np.array([[2.0, 4.0, 10.0, 12.0]], np.float32)] * b,
        [np.array([1], np.int32)] * b,
        capacity=4,
    )
    return images, gt


def test_hflip_flips_pixels_and_boxes(rng):
    images, gt = _batch(rng)
    flipped, fgt = hflip(images, gt, jnp.asarray([True, False]))
    w = 32
    # pixels mirrored in image 0, untouched in image 1
    np.testing.assert_allclose(
        np.asarray(flipped.pixels[0]), np.asarray(images.pixels[0])[:, ::-1], atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(flipped.pixels[1]), np.asarray(images.pixels[1]))
    assert np.asarray(fgt.boxes[0, 0]).tolist() == [w - 10, 4, w - 2, 12]
    assert np.asarray(fgt.boxes[1, 0]).tolist() == [2, 4, 10, 12]


def test_hflip_respects_valid_region(rng):
    # letterboxed image: valid width 16 inside a 32 canvas
    pixels = jnp.asarray(rng.randn(1, 32, 32, 3), jnp.float32)
    images = ImageBatch(
        pixels=pixels,
        image_sizes=jnp.asarray([[32.0, 16.0]]),
        scales=jnp.ones((1,)),
    )
    gt = GroundTruth.from_lists([np.array([[0.0, 0.0, 4.0, 4.0]], np.float32)], [[0]], 2)
    flipped, fgt = hflip(images, gt, jnp.asarray([True]))
    # box mirrors within the 16-wide valid region
    assert np.asarray(fgt.boxes[0, 0]).tolist() == [12, 0, 16, 4]
    # valid region content is the mirror of the original valid region
    np.testing.assert_allclose(
        np.asarray(flipped.pixels[0, :, :16]),
        np.asarray(images.pixels[0, :, :16])[:, ::-1],
        atol=1e-5,
    )


def test_augment_batch_runs(rng):
    images, gt = _batch(rng)
    out_images, out_gt = augment_batch(jax.random.PRNGKey(0), images, gt)
    assert out_images.pixels.shape == images.pixels.shape
    assert np.all(np.isfinite(np.asarray(out_images.pixels)))


def test_frozen_bn_mask():
    params = {
        "params": {
            "stem": {"conv": {"kernel": jnp.ones((3, 3, 3, 8))},
                     "frozen_bn": {"weight": jnp.ones(8), "running_mean": jnp.zeros(8)}},
        }
    }
    mask = frozen_bn_mask(params)
    assert mask["params"]["stem"]["conv"]["kernel"] is True
    assert mask["params"]["stem"]["frozen_bn"]["weight"] is False


def test_optimizer_keeps_frozen_bn_constant():
    params = {
        "w": jnp.ones((4,)),
        "frozen_bn": {"running_mean": jnp.zeros((4,))},
    }
    tx = make_optimizer(learning_rate=0.1, params=params)
    state, tx2 = create_train_state(params, tx=tx)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state.opt_state, params)
    new = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    assert not np.allclose(np.asarray(new["w"]), 1.0)
    np.testing.assert_allclose(np.asarray(new["frozen_bn"]["running_mean"]), 0.0)


def test_synthetic_coco_batches():
    ds = SyntheticCOCO(num_images=8, image_size=64, num_classes=5)
    it = make_batches(ds, batch_size=4, preprocess=PreprocessConf(image_size=64), max_gt_boxes=8)
    images, gt = next(it)
    assert images.pixels.shape == (4, 64, 64, 3)
    assert gt.boxes.shape == (4, 8, 4)
    assert np.asarray(gt.num_valid()).min() >= 1
    # boxes inside canvas
    v = np.asarray(gt.valid)
    b = np.asarray(gt.boxes)[v]
    assert b.min() >= 0 and b.max() <= 64


def test_checkpoint_roundtrip(tmp_path):
    from detax.train.checkpoint import CheckpointManager

    params = {"w": jnp.arange(4, dtype=jnp.float32)}
    state, tx = create_train_state(params, learning_rate=0.1)
    state = jax.tree_util.tree_map(lambda x: x, state)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(state, is_best=True, wait=True)
    template = jax.tree_util.tree_map(jnp.zeros_like, state)
    restored = mgr.restore(template)
    np.testing.assert_allclose(np.asarray(restored.params["w"]), np.arange(4))
    best = mgr.restore_best(template)
    np.testing.assert_allclose(np.asarray(best.params["w"]), np.arange(4))
    mgr.close()


def test_device_normalize_feed_matches_host_feed():
    """Fast feed (uint8 canvas + on-device normalize_canvas) must produce the
    same pixels/step result as the host-normalized float path."""
    from detax.configs import FasterRCNNConf
    from detax.models import FasterRCNN
    from detax.ops.preprocess import normalize_canvas
    from detax.train.step import make_train_step

    pp = PreprocessConf(image_size=64)
    ds = SyntheticCOCO(num_images=8, image_size=64, num_classes=5, cache=True)
    host = next(make_batches(ds, 4, pp, max_gt_boxes=8, epochs=1))
    dev = next(make_batches(ds, 4, pp, max_gt_boxes=8, epochs=1, device_normalize=True))
    assert dev[0].pixels.dtype == jnp.uint8
    normed = normalize_canvas(dev[0], pp)
    np.testing.assert_allclose(
        np.asarray(normed.pixels), np.asarray(host[0].pixels), atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(dev[1].boxes), np.asarray(host[1].boxes))

    # one full train step through each feed: identical loss
    conf = FasterRCNNConf(preprocess=pp)
    conf = conf.replace(roi=conf.roi.replace(num_classes=5))
    model = FasterRCNN(conf=conf)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), host[0])
    state, tx = create_train_state(params, learning_rate=0.01, rng=jax.random.PRNGKey(1))
    step = make_train_step(model, tx, augment=True, donate=False)
    _, m_host = step(state, *host)
    _, m_dev = step(state, *dev)
    np.testing.assert_allclose(
        float(m_dev["total_loss"]), float(m_host["total_loss"]), rtol=1e-5
    )


def test_synthetic_cache_consistent():
    ds = SyntheticCOCO(num_images=4, image_size=32, num_classes=3, cache=True)
    ref = SyntheticCOCO(num_images=4, image_size=32, num_classes=3)
    a1 = ds.get(2)
    a2 = ds.get(2)  # cache hit
    b = ref.get(2)
    assert a1[0] is a2[0]
    np.testing.assert_array_equal(a1[0], b[0])
    np.testing.assert_array_equal(a1[1], b[1])


def test_preemption_resume_bit_identical(tmp_path):
    """Preemption-safe resume (VERDICT r3 item 5): train 4 steps with a
    periodic save at step 2, 'kill' the run (discard all in-memory state),
    restore the full train state from the checkpoint, continue — the resumed
    trajectory must be bit-identical to the uninterrupted run (same data
    stream + the RNG lives in the state)."""
    from detax.configs import FasterRCNNConf
    from detax.models import FasterRCNN
    from detax.train.checkpoint import CheckpointManager
    from detax.train.step import make_train_step

    pp = PreprocessConf(image_size=64)
    ds = SyntheticCOCO(num_images=8, image_size=64, num_classes=5, cache=True)
    conf = FasterRCNNConf(preprocess=pp)
    conf = conf.replace(roi=conf.roi.replace(num_classes=5))
    model = FasterRCNN(conf=conf)
    it = make_batches(ds, 2, pp, max_gt_boxes=8)
    batches = [next(it) for _ in range(4)]

    params = jax.jit(model.init)(jax.random.PRNGKey(0), batches[0][0])
    state, tx = create_train_state(params, learning_rate=0.01, rng=jax.random.PRNGKey(1))
    step = make_train_step(model, tx, donate=False)

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    s = state
    for i in range(4):
        s, _ = step(s, *batches[i])
        if i == 1:
            mgr.save(s, wait=True)  # the periodic --save-every save
    full = s

    template = jax.tree_util.tree_map(jnp.zeros_like, state)
    resumed = mgr.restore(template)
    assert int(jax.device_get(resumed.step)) == 2
    for i in range(2, 4):
        resumed, _ = step(resumed, *batches[i])
    assert int(jax.device_get(resumed.step)) == 4
    for a, b in zip(
        jax.tree_util.tree_leaves(full.params), jax.tree_util.tree_leaves(resumed.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_cli_train_resume_wiring(tmp_path):
    """The CLI `--resume` path end-to-end: train 2 steps saving every step,
    then invoke cmd_train again with --resume --steps 4 — it must restore and
    finish at step 4 (and a third run with steps<=4 must no-op)."""
    import argparse

    from detax.cli import cmd_train
    from detax.train.checkpoint import CheckpointManager
    from detax.train.train_state import create_train_state

    def args(steps, resume):
        return argparse.Namespace(
            model="yolo", steps=steps, batch=2, lr=0.001, image_size=64,
            num_classes=5, seed=0, coco_json=None, coco_images=None,
            synthetic_images=8, checkpoint_dir=str(tmp_path / "ckpt"),
            log_every=1, no_augment=True, eval_images=0, masks=False,
            feed="device", resume=resume, save_every=1, profile="reference",
        )

    cmd_train(args(2, resume=False))
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    assert mgr.latest_step() == 2
    mgr.close()

    cmd_train(args(4, resume=True))
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    assert mgr.latest_step() == 4
    mgr.close()

    # resume with nothing left to do is a clean no-op
    cmd_train(args(3, resume=True))
