"""Pallas TPU kernel for greedy NMS — the suppression hot path.

Replaces the torchvision C++/CUDA ``nms`` kernel the reference depends on
(``python/src/utils.py:96-119``) with a TPU-native kernel. The XLA reference
implementation (``detax.ops.nms.nms_select``) runs one argmax+suppress step
per *output* box through ``lax.scan`` — each step is a separate dispatched
op. This kernel instead runs the whole greedy pass inside one ``pallas_call``
with everything resident in VMEM:

- boxes arrive score-sorted (XLA sort outside the kernel), as four
  coordinate planes ``(4, N)`` so each plane is lane-contiguous;
- blocks of 128 boxes are processed in order: an in-block sequential pass
  (128 tiny VPU steps on registers) resolves the triangular dependency, then
  one vectorized sweep suppresses all later blocks at once;
- total sequential depth is N (like greedy), but every step is an in-kernel
  VPU op on 128-wide vectors with zero dispatch overhead, and the cross-block
  work is fully vectorized 128×128 tiles.

Exactness: identical keep-set to ``suppression_mask`` / torchvision greedy
NMS (suppress IoU strictly greater than threshold), verified in
``tests/test_nms_pallas.py``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 128


def _nms_kernel(thresh_ref, coords_ref, valid_ref, keep_ref):
    """coords: (4, N) [x1, y1, x2, y2] score-sorted; valid: (1, N) f32;
    keep out: (1, N) f32."""
    n = coords_ref.shape[1]
    nb = n // BLOCK
    thresh = thresh_ref[0]

    x1 = coords_ref[0, :]
    y1 = coords_ref[1, :]
    x2 = coords_ref[2, :]
    y2 = coords_ref[3, :]
    area = (x2 - x1) * (y2 - y1)

    keep_ref[0, :] = valid_ref[0, :]

    col = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 0)

    def block_iou(bx1, by1, bx2, by2, barea, cx1, cy1, cx2, cy2, carea):
        """IoU of block rows (128,) vs block cols (128,) → (128, 128)."""
        lt_x = jnp.maximum(bx1[:, None], cx1[None, :])
        lt_y = jnp.maximum(by1[:, None], cy1[None, :])
        rb_x = jnp.minimum(bx2[:, None], cx2[None, :])
        rb_y = jnp.minimum(by2[:, None], cy2[None, :])
        iw = jnp.maximum(rb_x - lt_x, 0.0)
        ih = jnp.maximum(rb_y - lt_y, 0.0)
        inter = iw * ih
        union = barea[:, None] + carea[None, :] - inter
        return jnp.where(inter > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)

    dslice = lambda v, start: jax.lax.dynamic_slice_in_dim(v, start, BLOCK)

    def outer(bi, _):
        base = pl.multiple_of(bi * BLOCK, BLOCK)
        bx1 = dslice(x1, base)
        by1 = dslice(y1, base)
        bx2 = dslice(x2, base)
        by2 = dslice(y2, base)
        barea = dslice(area, base)
        ck = keep_ref[0, pl.ds(base, BLOCK)]

        iou_blk = block_iou(bx1, by1, bx2, by2, barea, bx1, by1, bx2, by2, barea)
        sup_blk = (iou_blk > thresh).astype(jnp.float32)

        def inner(r, ck):
            # kr = ck[r]; row_r = sup_blk[r, :]; suppress cols > r
            sel = (row == r).astype(jnp.float32)
            kr = jnp.sum(ck * sel[:, 0])  # ck[r] via masked reduce (no gather)
            row_r = jnp.sum(sup_blk * sel, axis=0)
            later = (jax.lax.broadcasted_iota(jnp.int32, (BLOCK, 1), 0)[:, 0] > r).astype(
                jnp.float32
            )
            return ck * (1.0 - kr * row_r * later)

        ck = jax.lax.fori_loop(0, BLOCK, inner, ck)
        keep_ref[0, pl.ds(base, BLOCK)] = ck

        def later_blocks(bj, _):
            base_j = pl.multiple_of(bj * BLOCK, BLOCK)
            cx1 = dslice(x1, base_j)
            cy1 = dslice(y1, base_j)
            cx2 = dslice(x2, base_j)
            cy2 = dslice(y2, base_j)
            carea = dslice(area, base_j)
            iou_cross = block_iou(bx1, by1, bx2, by2, barea, cx1, cy1, cx2, cy2, carea)
            suppressed = jnp.max(
                (iou_cross > thresh).astype(jnp.float32) * ck[:, None], axis=0
            )
            keep_ref[0, pl.ds(base_j, BLOCK)] = keep_ref[0, pl.ds(base_j, BLOCK)] * (
                1.0 - suppressed
            )
            return 0

        jax.lax.fori_loop(bi + 1, nb, later_blocks, 0)
        return 0

    jax.lax.fori_loop(0, nb, outer, 0)


def _pad_to_block(n: int) -> int:
    return ((n + BLOCK - 1) // BLOCK) * BLOCK


@functools.partial(jax.jit, static_argnames=("iou_threshold", "interpret"))
def nms_keep_sorted(
    boxes_sorted: Array,
    valid_sorted: Array,
    iou_threshold: float,
    interpret: bool = False,
) -> Array:
    """Greedy-NMS keep mask over score-sorted ``(N, 4)`` boxes (Pallas).

    Returns an ``(N,)`` bool mask. ``N`` is padded to a multiple of 128
    internally.
    """
    n = boxes_sorted.shape[0]
    n_pad = _pad_to_block(n)
    coords = jnp.swapaxes(boxes_sorted.astype(jnp.float32), -1, -2)  # (4, N)
    if n_pad != n:
        coords = jnp.pad(coords, ((0, 0), (0, n_pad - n)))
        valid_sorted = jnp.pad(valid_sorted, (0, n_pad - n))
    valid_f = valid_sorted.astype(jnp.float32)[None, :]

    keep = pl.pallas_call(
        _nms_kernel,
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(jnp.asarray([iou_threshold], jnp.float32), coords, valid_f)
    return keep[0, :n] > 0.5


def nms_select_pallas(
    boxes: Array,
    scores: Array,
    iou_threshold: float,
    max_out: int,
    valid: Optional[Array] = None,
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """Drop-in for :func:`detax.ops.nms.nms_select` backed by the kernel.

    Sorts by score (XLA), runs the Pallas keep-mask kernel, then emits the
    first ``max_out`` kept indices in score order.
    """
    n = boxes.shape[0]
    s = jnp.where(valid, scores, -jnp.inf) if valid is not None else scores
    order = jnp.argsort(-s)
    sorted_boxes = jnp.take(boxes, order, axis=0)
    sorted_valid = jnp.take(s, order) > -jnp.inf
    keep_sorted = nms_keep_sorted(sorted_boxes, sorted_valid, iou_threshold, interpret=interpret)

    # positions of kept entries, in score order
    pos = jnp.arange(n)
    key = jnp.where(keep_sorted, pos, n)
    top = jnp.sort(key)[:max_out]
    ok = top < n
    idx = jnp.take(order, jnp.where(ok, top, 0))
    return jnp.where(ok, idx, 0).astype(jnp.int32), ok


def batched_nms_pallas(
    boxes: Array,
    scores: Array,
    idxs: Array,
    iou_threshold: float,
    max_out: int,
    valid: Optional[Array] = None,
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """Class/level-aware variant via the coordinate-offset trick."""
    if valid is not None:
        safe = jnp.where(valid[:, None], boxes, 0.0)
    else:
        safe = boxes
    max_coordinate = jnp.max(safe)
    offsets = idxs.astype(boxes.dtype) * (max_coordinate + 1.0)
    return nms_select_pallas(
        boxes + offsets[:, None], scores, iou_threshold, max_out, valid=valid, interpret=interpret
    )
