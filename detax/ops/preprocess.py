"""Fused on-device preprocessing: letterbox resize + normalize + NHWC.

Replaces the reference's host-side PIL/torchvision pipeline
(``python/src/preprocessing/classification/imagenet.py:5-17``: Resize256 →
CenterCrop224 → ToTensor → Normalize) and its dynamic ``ImageList`` padding
(``structures/image_list.py:65-117``) with a single jitted XLA program:
uint8 pixels go to the device once, everything else (cast, scale, bilinear
resize, pad, normalize) fuses on-chip — the "decode→letterbox→normalize"
north-star hot path. JPEG *entropy decode* itself is host work (no TPU op
exists); the serving layer decodes with the native loader and ships raw
uint8.

All shapes are static: one compiled program per (input HW, canvas) pair.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from detax.configs.detector import PreprocessConf
from detax.structures.image_batch import ImageBatch


def letterbox_batch(pixels: Array, conf: PreprocessConf) -> ImageBatch:
    """uint8/float ``(B, H0, W0, 3)`` → normalized letterboxed ``ImageBatch``.

    Scale = min(S/H0, S/W0); image is placed at the top-left corner (matching
    the reference's bottom/right zero padding, ``image_list.py:97-107``),
    remainder holds the (normalized) zero pixel.
    """
    size = conf.image_size
    b, h0, w0, c = pixels.shape
    scale = min(size / h0, size / w0)
    new_h, new_w = round(h0 * scale), round(w0 * scale)

    x = pixels.astype(jnp.float32)
    if (new_h, new_w) != (h0, w0):
        x = jax.image.resize(x, (b, new_h, new_w, c), method="bilinear")
    mean = jnp.asarray(conf.pixel_mean, jnp.float32)
    std = jnp.asarray(conf.pixel_std, jnp.float32)
    x = (x - mean) / std
    if conf.out_dtype:
        # emit the model's compute dtype (e.g. bf16 serving): the stem casts
        # anyway, so this only moves the rounding site and halves the pixels
        # buffer the model reads
        x = x.astype(conf.out_dtype)
    pad_h, pad_w = size - new_h, size - new_w
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))

    sizes = jnp.tile(jnp.asarray([[float(new_h), float(new_w)]], jnp.float32), (b, 1))
    scales = jnp.full((b,), scale, jnp.float32)
    return ImageBatch(pixels=x, image_sizes=sizes, scales=scales)


def letterbox_batch_varsize(pixels: Array, sizes: Array, conf: PreprocessConf) -> ImageBatch:
    """Heterogeneous per-image sizes inside ONE on-device batch.

    The reference pads variable-size images into a common batch tensor on
    device (``ImageList.from_tensors``, ``image_list.py:65-117``); detax's
    TPU contract additionally letterboxes to the fixed square canvas. The
    host ships each image zero-padded into a shared ``(B, Hmax, Wmax, C)``
    buffer (pure memcpy, no host resize) plus its true ``(h, w)``; this one
    jitted program then does per-image scale computation, bilinear resize,
    normalization and zero-padding — static shapes, per-image dynamics as
    traced values.

    Args:
      pixels: ``(B, Hmax, Wmax, C)`` uint8/float; image ``i`` occupies the
        top-left ``sizes[i]`` region.
      sizes: ``(B, 2)`` true (h, w) per image.

    Returns the same ``ImageBatch`` contract as :func:`letterbox_batch`.
    """
    size = conf.image_size
    b, hmax, wmax, c = pixels.shape
    mean = jnp.asarray(conf.pixel_mean, jnp.float32)
    std = jnp.asarray(conf.pixel_std, jnp.float32)
    coords = jnp.arange(size, dtype=jnp.float32)

    def one(img: Array, hw: Array):
        h = hw[0].astype(jnp.float32)
        w = hw[1].astype(jnp.float32)
        scale = jnp.minimum(size / h, size / w)
        new_h = jnp.round(h * scale)
        new_w = jnp.round(w * scale)
        x = img.astype(jnp.float32)

        def axis_interp(arr, n_src, n_dst, axis):
            # half-pixel-center source coords with the post-rounding ratio
            # n_src/n_dst — the jax.image.resize / host-path convention
            # (1/scale would drift: round(h*scale) != h*scale in general)
            src = (coords + 0.5) * (n_src / n_dst) - 0.5
            src = jnp.clip(src, 0.0, n_src - 1.0)
            lo = jnp.floor(src)
            f = (src - lo).astype(jnp.float32)
            lo = lo.astype(jnp.int32)
            hi = jnp.minimum(lo + 1, (n_src - 1.0).astype(jnp.int32))
            shape = [1, 1]
            shape[axis] = size
            f = f.reshape(shape + [1])
            return (
                jnp.take(arr, lo, axis=axis) * (1.0 - f)
                + jnp.take(arr, hi, axis=axis) * f
            )

        x = axis_interp(x, h, new_h, 0)  # (S, Wmax, C)
        x = axis_interp(x, w, new_w, 1)  # (S, S, C)
        x = (x - mean) / std
        # outside the valid letterboxed region: normalized-zero padding,
        # exactly like letterbox_batch's post-normalize jnp.pad
        yy = coords[:, None, None]
        xx = coords[None, :, None]
        x = jnp.where((yy < new_h) & (xx < new_w), x, 0.0)
        return x, jnp.stack([new_h, new_w]), scale

    out, out_sizes, scales = jax.vmap(one)(pixels, sizes.astype(jnp.float32))
    return ImageBatch(pixels=out, image_sizes=out_sizes, scales=scales)


def normalize_canvas(images: ImageBatch, conf: PreprocessConf) -> ImageBatch:
    """Normalize an already-letterboxed uint8 canvas batch on device.

    The device half of the fast training feed: the host ships raw uint8
    canvases (pure memcpy — resize, when needed, was done by the native
    loader or at dataset-build time) and this fuses cast + ``(x-mean)/std``
    + zero-padding outside each image's valid region into the train step.
    Output matches :func:`letterbox_batch`'s pixel contract bit-for-bit for
    same-size sources (both are elementwise f32 ``(x - mean) / std``).
    """
    x = images.pixels.astype(jnp.float32)
    mean = jnp.asarray(conf.pixel_mean, jnp.float32)
    std = jnp.asarray(conf.pixel_std, jnp.float32)
    x = (x - mean) / std
    b, h, w, _ = x.shape
    yy = jnp.arange(h, dtype=jnp.float32)[None, :, None, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, None, :, None]
    valid = (yy < images.image_sizes[:, 0, None, None, None]) & (
        xx < images.image_sizes[:, 1, None, None, None]
    )
    x = jnp.where(valid, x, 0.0)
    if conf.out_dtype:
        x = x.astype(conf.out_dtype)
    return ImageBatch(pixels=x, image_sizes=images.image_sizes, scales=images.scales)


def classification_preprocess(pixels: Array, conf: PreprocessConf, crop: int = 224) -> Array:
    """ImageNet eval transform parity (reference ``imagenet.py:5-17``):
    resize shorter side to 256 → center crop ``crop`` → normalize. Static
    shapes; returns ``(B, crop, crop, 3)``."""
    b, h0, w0, c = pixels.shape
    short = 256
    scale = short / min(h0, w0)
    new_h, new_w = round(h0 * scale), round(w0 * scale)
    x = jax.image.resize(pixels.astype(jnp.float32), (b, new_h, new_w, c), method="bilinear")
    top = (new_h - crop) // 2
    left = (new_w - crop) // 2
    x = jax.lax.dynamic_slice(x, (0, top, left, 0), (b, crop, crop, c))
    mean = jnp.asarray(conf.pixel_mean, jnp.float32)
    std = jnp.asarray(conf.pixel_std, jnp.float32)
    return (x - mean) / std


def boxes_to_canvas(boxes: Array, scales: Array) -> Array:
    """Map original-image GT boxes into letterboxed canvas coordinates."""
    return boxes * scales[..., None, None]


def boxes_to_original(boxes: Array, scales: Array) -> Array:
    """Map predicted canvas boxes back to original-image coordinates."""
    return boxes / scales[..., None, None]
