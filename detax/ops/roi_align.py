"""ROIAlign / ROIPool as XLA gathers — replaces torchvision's native kernels.

The reference reaches C++/CUDA through ``torchvision.ops.roi_align`` and
``RoIPool`` (``python/src/models/modules/roi_poolers.py:11-12,64-71,229-231``).
On TPU the same bilinear sampling becomes a handful of wide gathers that XLA
pipelines from HBM — no custom kernel needed for speed-of-light here because
the op is gather-bound, not compute-bound.

Semantics match torchvision exactly (including the ``aligned=True`` half-pixel
convention documented at ``roi_poolers.py:30-45`` and the border handling of
torchvision's ``bilinear_interpolate``), with one TPU-driven deviation: the
reference's default ``sampling_ratio=0`` means *adaptive* (per-box) sample
counts, which is a dynamic shape; detax uses a fixed ``sampling_ratio``
(default 2, the value adaptive mode picks for the canonical 224px box on P4).

The multi-level pooler replaces the per-level loop + ``index_put_`` scatter of
the reference ``ROIPooler.forward`` (``roi_poolers.py:269-331``) with a single
gather from all levels' features flattened into one ragged-concatenated array
— every box reads from its assigned level via computed flat offsets, so there
is no L× wasted compute and no scatter.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import Array


def _bilinear_weights(coord: Array, size: int) -> Tuple[Array, Array, Array, Array, Array]:
    """torchvision ``bilinear_interpolate`` index/weight computation for one axis.

    Returns ``(low, high, w_low, w_high, in_range)`` where ``in_range`` is the
    torchvision border test ``-1 <= coord <= size``.
    """
    in_range = (coord >= -1.0) & (coord <= size)
    c = jnp.clip(coord, 0.0, None)
    low = jnp.floor(c).astype(jnp.int32)
    at_edge = low >= size - 1
    low = jnp.where(at_edge, size - 1, low)
    high = jnp.where(at_edge, size - 1, low + 1)
    c = jnp.where(at_edge, low.astype(c.dtype), c)
    frac = c - low.astype(c.dtype)
    return low, high, 1.0 - frac, frac, in_range


def _sample_coords(
    boxes: Array,
    spatial_scale: float,
    output_size: Tuple[int, int],
    sampling_ratio: int,
    aligned: bool,
) -> Tuple[Array, Array]:
    """Per-box sampling point coordinates.

    Returns ``(ys, xs)`` with shapes ``(N, ph*ratio)`` / ``(N, pw*ratio)`` in
    feature-map coordinates.
    """
    ph, pw = output_size
    offset = 0.5 if aligned else 0.0
    x1 = boxes[:, 0] * spatial_scale - offset
    y1 = boxes[:, 1] * spatial_scale - offset
    x2 = boxes[:, 2] * spatial_scale - offset
    y2 = boxes[:, 3] * spatial_scale - offset
    roi_w = x2 - x1
    roi_h = y2 - y1
    if not aligned:  # legacy mode forces malformed ROIs to 1x1
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    bin_h = roi_h / ph
    bin_w = roi_w / pw

    r = sampling_ratio
    # sub-sample offsets within a bin: (iy + 0.5) / ratio for iy in [0, r)
    sub = (jnp.arange(r, dtype=jnp.float32) + 0.5) / r
    grid_y = jnp.arange(ph, dtype=jnp.float32)[:, None] + sub[None, :]  # (ph, r)
    grid_x = jnp.arange(pw, dtype=jnp.float32)[:, None] + sub[None, :]
    ys = y1[:, None] + bin_h[:, None] * grid_y.reshape(-1)[None, :]  # (N, ph*r)
    xs = x1[:, None] + bin_w[:, None] * grid_x.reshape(-1)[None, :]  # (N, pw*r)
    return ys, xs


def roi_align(
    features: Array,
    boxes: Array,
    spatial_scale: float,
    output_size: Tuple[int, int] = (7, 7),
    sampling_ratio: int = 2,
    aligned: bool = True,
) -> Array:
    """Single-level ROIAlign.

    Args:
      features: ``(H, W, C)`` feature map (HWC — TPU layout).
      boxes: ``(N, 4)`` xyxy in input-image coordinates.

    Returns:
      ``(N, ph, pw, C)`` pooled features (average of ``sampling_ratio²``
      bilinear samples per bin, matching torchvision ``roi_align``).
    """
    h, w, c = features.shape
    n = boxes.shape[0]
    ph, pw = output_size
    r = sampling_ratio

    ys, xs = _sample_coords(boxes, spatial_scale, output_size, r, aligned)
    yl, yh, wyl, wyh, y_ok = _bilinear_weights(ys, h)  # (N, ph*r)
    xl, xh, wxl, wxh, x_ok = _bilinear_weights(xs, w)  # (N, pw*r)

    flat = features.reshape(h * w, c)

    def gather(yi: Array, xi: Array) -> Array:
        idx = yi[:, :, None] * w + xi[:, None, :]  # (N, ph*r, pw*r)
        return jnp.take(flat, idx.reshape(n, -1), axis=0).reshape(n, ph * r, pw * r, c)

    v_ll = gather(yl, xl)
    v_lh = gather(yl, xh)
    v_hl = gather(yh, xl)
    v_hh = gather(yh, xh)

    wy_l = (wyl * y_ok)[:, :, None]
    wy_h = (wyh * y_ok)[:, :, None]
    wx_l = (wxl * x_ok)[:, None, :]
    wx_h = (wxh * x_ok)[:, None, :]
    out = (
        v_ll * (wy_l * wx_l)[..., None]
        + v_lh * (wy_l * wx_h)[..., None]
        + v_hl * (wy_h * wx_l)[..., None]
        + v_hh * (wy_h * wx_h)[..., None]
    )
    out = out.reshape(n, ph, r, pw, r, c)
    return out.mean(axis=(2, 4))


def roi_pool(
    features: Array,
    boxes: Array,
    spatial_scale: float,
    output_size: Tuple[int, int] = (7, 7),
    samples_per_bin: int = 4,
) -> Array:
    """Max-pool ROI pooling (torchvision ``RoIPool`` capability,
    reference ``roi_poolers.py:229-231``).

    torchvision's RoIPool max-pools over *all* integer cells in each bin — a
    dynamic count; the static-shape TPU version max-pools over a fixed
    ``samples_per_bin × samples_per_bin`` bilinear sample grid per bin, which
    converges to the same result as the grid densifies.
    """
    h, w, c = features.shape
    n = boxes.shape[0]
    ph, pw = output_size
    r = samples_per_bin
    ys, xs = _sample_coords(boxes, spatial_scale, output_size, r, aligned=False)
    yl, yh, wyl, wyh, y_ok = _bilinear_weights(ys, h)
    xl, xh, wxl, wxh, x_ok = _bilinear_weights(xs, w)
    flat = features.reshape(h * w, c)

    def gather(yi, xi):
        idx = yi[:, :, None] * w + xi[:, None, :]
        return jnp.take(flat, idx.reshape(n, -1), axis=0).reshape(n, ph * r, pw * r, c)

    wy_l = (wyl * y_ok)[:, :, None]
    wy_h = (wyh * y_ok)[:, :, None]
    wx_l = (wxl * x_ok)[:, None, :]
    wx_h = (wxh * x_ok)[:, None, :]
    vals = (
        gather(yl, xl) * (wy_l * wx_l)[..., None]
        + gather(yl, xh) * (wy_l * wx_h)[..., None]
        + gather(yh, xl) * (wy_h * wx_l)[..., None]
        + gather(yh, xh) * (wy_h * wx_h)[..., None]
    )
    vals = vals.reshape(n, ph, r, pw, r, c)
    return vals.max(axis=(2, 4))


def assign_boxes_to_levels(
    boxes: Array,
    min_level: int,
    max_level: int,
    canonical_box_size: int = 224,
    canonical_level: int = 4,
) -> Array:
    """FPN paper eqn. (1) level assignment.

    (reference ``assign_boxes_to_levels``, ``roi_poolers.py:103-131``.)
    ``boxes`` is ``(..., 4)``; returns int32 levels in ``[min_level, max_level]``.
    """
    area = (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])
    sqrt_area = jnp.sqrt(jnp.clip(area, 0))
    lvl = jnp.floor(canonical_level + jnp.log2(sqrt_area / canonical_box_size + 1e-8))
    return jnp.clip(lvl, min_level, max_level).astype(jnp.int32)


def multiscale_roi_align(
    features: Sequence[Array],
    boxes: Array,
    strides: Sequence[int],
    output_size: Tuple[int, int] = (7, 7),
    sampling_ratio: int = 2,
    aligned: bool = True,
    canonical_box_size: int = 224,
    canonical_level: int = 4,
) -> Array:
    """Multi-level ROIAlign over FPN features (reference ``ROIPooler.forward``).

    Args:
      features: per-level ``(B, Hl, Wl, C)`` maps, fine→coarse.
      boxes: ``(B, R, 4)`` xyxy in input-image coordinates.
      strides: per-level feature strides (e.g. ``[4, 8, 16, 32]``); levels are
        ``log2(stride)`` as in the reference (``roi_poolers.py:251-257``).

    Returns:
      ``(B, R, ph, pw, C)`` pooled features.

    Design: all levels are flattened and concatenated into one ``(B, S, C)``
    array; each box's four bilinear neighbors become flat indices
    ``level_offset + y * W_lvl + x`` and a single gather serves every level —
    the TPU-native replacement for the reference's per-level loop + scatter.
    """
    assert len(features) == len(strides)
    b, r_boxes = boxes.shape[0], boxes.shape[1]
    c = features[0].shape[-1]
    ph, pw = output_size
    r = sampling_ratio
    levels = [int(math.log2(s)) for s in strides]
    assert levels == sorted(levels), "features must be ordered fine→coarse"
    min_level, max_level = levels[0], levels[-1]

    heights = jnp.array([f.shape[1] for f in features], jnp.int32)
    widths = jnp.array([f.shape[2] for f in features], jnp.int32)
    sizes = [f.shape[1] * f.shape[2] for f in features]
    offsets = jnp.array([sum(sizes[:i]) for i in range(len(sizes))], jnp.int32)
    scales = jnp.array([1.0 / s for s in strides], jnp.float32)

    flat = jnp.concatenate([f.reshape(b, -1, c) for f in features], axis=1)  # (B, S, C)

    lvl = assign_boxes_to_levels(boxes, min_level, max_level, canonical_box_size, canonical_level)
    lvl_idx = lvl - min_level  # (B, R) in [0, L)

    box_scale = jnp.take(scales, lvl_idx)  # (B, R)
    box_h = jnp.take(heights, lvl_idx)
    box_w = jnp.take(widths, lvl_idx)
    box_off = jnp.take(offsets, lvl_idx)

    offset = 0.5 if aligned else 0.0
    x1 = boxes[..., 0] * box_scale - offset
    y1 = boxes[..., 1] * box_scale - offset
    x2 = boxes[..., 2] * box_scale - offset
    y2 = boxes[..., 3] * box_scale - offset
    roi_w, roi_h = x2 - x1, y2 - y1
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    bin_h = roi_h / ph
    bin_w = roi_w / pw

    sub = (jnp.arange(r, dtype=jnp.float32) + 0.5) / r
    grid_y = (jnp.arange(ph, dtype=jnp.float32)[:, None] + sub[None, :]).reshape(-1)  # (ph*r,)
    grid_x = (jnp.arange(pw, dtype=jnp.float32)[:, None] + sub[None, :]).reshape(-1)
    ys = y1[..., None] + bin_h[..., None] * grid_y  # (B, R, ph*r)
    xs = x1[..., None] + bin_w[..., None] * grid_x  # (B, R, pw*r)

    # Like _bilinear_weights, but the clamp size varies per box (its level).
    h_f = box_h[..., None].astype(jnp.float32)
    w_f = box_w[..., None].astype(jnp.float32)

    def axis_weights(coord, size_f, size_i):
        in_range = (coord >= -1.0) & (coord <= size_f)
        cc = jnp.clip(coord, 0.0, None)
        low = jnp.floor(cc).astype(jnp.int32)
        at_edge = low >= size_i[..., None] - 1
        low = jnp.where(at_edge, size_i[..., None] - 1, low)
        high = jnp.where(at_edge, low, low + 1)
        cc = jnp.where(at_edge, low.astype(cc.dtype), cc)
        frac = cc - low.astype(cc.dtype)
        return low, high, 1.0 - frac, frac, in_range

    yl, yh, wyl, wyh, y_ok = axis_weights(ys, h_f, box_h)
    xl, xh, wxl, wxh, x_ok = axis_weights(xs, w_f, box_w)

    def gather(yi, xi):
        idx = box_off[..., None, None] + yi[..., :, None] * box_w[..., None, None] + xi[..., None, :]
        idx = idx.reshape(b, -1)  # (B, R*ph*r*pw*r)
        out = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return out.reshape(b, r_boxes, ph * r, pw * r, c)

    wy_l = (wyl * y_ok)[..., :, None]
    wy_h = (wyh * y_ok)[..., :, None]
    wx_l = (wxl * x_ok)[..., None, :]
    wx_h = (wxh * x_ok)[..., None, :]
    out = (
        gather(yl, xl) * (wy_l * wx_l)[..., None]
        + gather(yl, xh) * (wy_l * wx_h)[..., None]
        + gather(yh, xl) * (wy_h * wx_l)[..., None]
        + gather(yh, xh) * (wy_h * wx_h)[..., None]
    )
    out = out.reshape(b, r_boxes, ph, r, pw, r, c)
    return out.mean(axis=(3, 5))
