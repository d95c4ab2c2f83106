import numpy as np
import jax.numpy as jnp

from detax.configs.detector import PreprocessConf
from detax.ops.preprocess import (
    boxes_to_canvas,
    boxes_to_original,
    classification_preprocess,
    letterbox_batch,
)


def test_letterbox_landscape(rng):
    conf = PreprocessConf(image_size=64)
    img = (rng.rand(2, 30, 60, 3) * 255).astype(np.uint8)
    out = letterbox_batch(jnp.asarray(img), conf)
    assert out.pixels.shape == (2, 64, 64, 3)
    # scale = 64/60; valid region 32x64
    assert np.asarray(out.image_sizes)[0].tolist() == [32.0, 64.0]
    assert np.allclose(np.asarray(out.scales), 64 / 60)
    # padding is zero in *normalized* space (Detectron2 convention: the
    # reference normalizes then zero-pads, image_list.py:97-107)
    pad = np.asarray(out.pixels)[:, 33:, :, :]
    assert np.allclose(pad, 0.0, atol=1e-5)


def test_letterbox_identity_size(rng):
    conf = PreprocessConf(image_size=32)
    img = (rng.rand(1, 32, 32, 3) * 255).astype(np.uint8)
    out = letterbox_batch(jnp.asarray(img), conf)
    want = (img.astype(np.float32) - conf.pixel_mean) / conf.pixel_std
    np.testing.assert_allclose(np.asarray(out.pixels), want, atol=1e-4)


def test_classification_preprocess_shape(rng):
    conf = PreprocessConf()
    img = (rng.rand(2, 300, 400, 3) * 255).astype(np.uint8)
    out = classification_preprocess(jnp.asarray(img), conf)
    assert out.shape == (2, 224, 224, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_box_coordinate_roundtrip(rng):
    boxes = jnp.asarray(rng.rand(2, 5, 4) * 100)
    scales = jnp.asarray([0.5, 2.0])
    canvas = boxes_to_canvas(boxes, scales)
    back = boxes_to_original(canvas, scales)
    np.testing.assert_allclose(np.asarray(back), np.asarray(boxes), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(canvas[0]), np.asarray(boxes[0]) * 0.5, rtol=1e-6)
