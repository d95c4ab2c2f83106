"""On-device data augmentation (BASELINE config 5: "on-device augmentation").

The reference has no augmentation at all; this implements the standard
detection set as pure jnp ops inside the jitted step — horizontal flip (with
box flip), brightness/contrast jitter, and box-safe handling of the
letterboxed valid region. Everything is batched and static-shaped.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import Array

from detax.structures.detections import GroundTruth
from detax.structures.image_batch import ImageBatch


def hflip(images: ImageBatch, gt: GroundTruth, flip_mask: Array) -> Tuple[ImageBatch, GroundTruth]:
    """Horizontally flip selected images *within their valid region* and
    mirror the GT boxes. ``flip_mask``: ``(B,)`` bool."""
    pixels = images.pixels
    b, h, w, c = pixels.shape
    widths = images.image_sizes[:, 1]  # (B,) valid width per image

    # flip the full canvas, then roll each row left so the valid region
    # stays anchored at x=0 (canvas width - valid width shift)
    flipped = pixels[:, :, ::-1, :]
    shift = (w - widths).astype(jnp.int32)  # (B,)
    col = jnp.arange(w)
    idx = (col[None, :] + shift[:, None]) % w  # (B, W)
    rolled = jnp.take_along_axis(flipped, idx[:, None, :, None], axis=2)
    pixels = jnp.where(flip_mask[:, None, None, None], rolled, pixels)

    x1, y1, x2, y2 = (gt.boxes[..., i] for i in range(4))
    wv = widths[:, None]
    fb = jnp.stack([wv - x2, y1, wv - x1, y2], axis=-1)
    boxes = jnp.where(flip_mask[:, None, None], fb, gt.boxes)
    boxes = jnp.where(gt.valid[..., None], boxes, 0.0)

    masks = gt.masks
    if masks is not None:
        # mirror instance bitmaps within the valid region (mask resolution)
        mw = masks.shape[-1]
        stride = w // mw  # canvas width / mask width
        mwidths = (widths / stride).astype(jnp.int32)  # (B,)
        mflip = masks[..., ::-1]
        mcol = jnp.arange(mw)
        midx = (mcol[None, :] + (mw - mwidths)[:, None]) % mw  # (B, mw)
        mrolled = jnp.take_along_axis(mflip, midx[:, None, None, :], axis=-1)
        masks = jnp.where(flip_mask[:, None, None, None], mrolled, masks)

    return (
        ImageBatch(pixels=pixels, image_sizes=images.image_sizes, scales=images.scales),
        GroundTruth(boxes=boxes, classes=gt.classes, valid=gt.valid, masks=masks),
    )


def color_jitter(
    key: Array, pixels: Array, brightness: float = 0.2, contrast: float = 0.2
) -> Array:
    """Per-image multiplicative brightness + contrast jitter (on normalized
    pixels, so brightness is an additive shift in std units)."""
    b = pixels.shape[0]
    kb, kc = jax.random.split(key)
    bright = jax.random.uniform(kb, (b, 1, 1, 1), minval=-brightness, maxval=brightness)
    contr = 1.0 + jax.random.uniform(kc, (b, 1, 1, 1), minval=-contrast, maxval=contrast)
    mean = jnp.mean(pixels, axis=(1, 2, 3), keepdims=True)
    return (pixels - mean) * contr + mean + bright


def augment_batch(
    key: Array, images: ImageBatch, gt: GroundTruth, hflip_prob: float = 0.5
) -> Tuple[ImageBatch, GroundTruth]:
    """Full augmentation pipeline used by the train step."""
    k1, k2 = jax.random.split(key)
    flip_mask = jax.random.bernoulli(k1, hflip_prob, (images.pixels.shape[0],))
    images, gt = hflip(images, gt, flip_mask)
    pixels = color_jitter(k2, images.pixels)
    return (
        ImageBatch(pixels=pixels, image_sizes=images.image_sizes, scales=images.scales),
        gt,
    )
