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


def test_letterbox_varsize_matches_host_path(rng):
    """On-device heterogeneous-size letterbox (the reference's
    ImageList.from_tensors analog) must match the host numpy path of
    make_batches for mixed-size images in one batch."""
    import jax
    import jax.numpy as jnp

    from detax.configs.detector import PreprocessConf
    from detax.ops.preprocess import letterbox_batch_varsize
    from detax.train.coco import _resize_bilinear

    conf = PreprocessConf(image_size=64)
    size = conf.image_size
    shapes = [(48, 80), (72, 40), (64, 64)]
    hmax = max(s[0] for s in shapes)
    wmax = max(s[1] for s in shapes)
    buf = np.zeros((len(shapes), hmax, wmax, 3), np.float32)
    sizes = np.zeros((len(shapes), 2), np.int32)
    raws = []
    for i, (h, w) in enumerate(shapes):
        img = (rng.rand(h, w, 3) * 255).astype(np.float32)
        buf[i, :h, :w] = img
        sizes[i] = (h, w)
        raws.append(img)

    batch = jax.jit(lambda p, s: letterbox_batch_varsize(p, s, conf))(
        jnp.asarray(buf), jnp.asarray(sizes)
    )

    mean = np.asarray(conf.pixel_mean, np.float32)
    std = np.asarray(conf.pixel_std, np.float32)
    for i, (h, w) in enumerate(shapes):
        scale = min(size / h, size / w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        want = np.zeros((size, size, 3), np.float32)
        resized = _resize_bilinear(raws[i], nh, nw) if (nh, nw) != (h, w) else raws[i]
        want[:nh, :nw] = (resized - mean) / std
        got = np.asarray(batch.pixels[i])
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(batch.image_sizes[i]), [nh, nw])
        np.testing.assert_allclose(np.asarray(batch.scales[i]), scale, rtol=1e-6)
