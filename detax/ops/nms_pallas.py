"""Pallas TPU kernel for greedy NMS — the suppression hot path.

Replaces the torchvision C++/CUDA ``nms`` kernel the reference depends on
(``python/src/utils.py:96-119``) with a TPU-native kernel. The XLA reference
implementation (``detax.ops.nms.nms_select``) runs one argmax+suppress step
per *output* box through ``lax.scan``; on TPU each while-loop iteration has
fixed overhead, which dominates at 1000 outputs. This kernel instead runs the
whole greedy pass for the **entire batch** inside one ``pallas_call`` with
everything resident in VMEM:

- boxes arrive score-sorted per image (``lax.top_k`` outputs already are),
  as coordinate planes ``(B, 4, N)`` so lanes are contiguous along N;
- blocks of 128 boxes are processed in score order: an in-block sequential
  pass (128 VPU steps on ``(B, 128)`` vectors) resolves the triangular
  dependency, then one vectorized ``(B, 128, 128)`` sweep per later block
  applies the suppression forward — the sweep is skipped entirely when the
  current block kept nothing;
- total sequential depth is N (greedy's inherent depth), but every step is
  an in-kernel VPU op on the whole batch with zero dispatch overhead.

Exactness: identical keep-set to ``suppression_mask`` / torchvision greedy
NMS (suppress IoU strictly greater than threshold), verified in
``tests/test_nms_pallas.py``. Runs in interpreter mode automatically on
non-TPU backends so the same call sites work in CPU tests.

VMEM budget: coords ``(B,4,N)`` f32 + keep/valid ``(B,N)`` + two
``(B,128,128)`` tiles — for B=32 this caps N at ~8k per call; callers run
per-level (levels never suppress each other), which also shrinks N.
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
    """coords: (B, 4, N) [x1,y1,x2,y2], score-sorted along N per image;
    valid: (B, N) f32; keep out: (B, N) f32.

    Per 128-block: the triangular in-block dependency is resolved by
    fixed-point iteration of the suppression operator
    ``F(k)[i] = entry[i] & !any_{j<i}(k[j] & iou[j,i] > t)`` — after sweep s
    the first s rows are permanently correct, so the unique fixpoint is the
    exact greedy solution and the while_loop terminates in ≤128 sweeps
    (typically a handful). Pallas TPU has no value-space dynamic_slice, which
    rules out the naive one-row-at-a-time loop.
    """
    nb = coords_ref.shape[2] // BLOCK
    thresh = thresh_ref[0]

    keep_ref[:, :] = valid_ref[:, :]

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 1)
    earlier = (row_ids < col_ids).astype(jnp.float32)[None]  # j strictly before i

    def load_block(base):
        x1 = coords_ref[:, 0, pl.ds(base, BLOCK)]
        y1 = coords_ref[:, 1, pl.ds(base, BLOCK)]
        x2 = coords_ref[:, 2, pl.ds(base, BLOCK)]
        y2 = coords_ref[:, 3, pl.ds(base, BLOCK)]
        return x1, y1, x2, y2, (x2 - x1) * (y2 - y1)

    def block_iou(cur, other):
        """(B,128) planes → (B,128,128) IoU of cur rows vs other cols."""
        (ax1, ay1, ax2, ay2, aa) = cur
        (bx1, by1, bx2, by2, ba) = other
        lt_x = jnp.maximum(ax1[:, :, None], bx1[:, None, :])
        lt_y = jnp.maximum(ay1[:, :, None], by1[:, None, :])
        rb_x = jnp.minimum(ax2[:, :, None], bx2[:, None, :])
        rb_y = jnp.minimum(ay2[:, :, None], by2[:, None, :])
        iw = jnp.maximum(rb_x - lt_x, 0.0)
        ih = jnp.maximum(rb_y - lt_y, 0.0)
        inter = iw * ih
        union = aa[:, :, None] + ba[:, None, :] - inter
        return jnp.where(inter > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)

    def outer(bi, _):
        base = pl.multiple_of(bi * BLOCK, BLOCK)
        cur = load_block(base)
        entry = keep_ref[:, pl.ds(base, BLOCK)]  # (B,128), pruned by earlier blocks

        # suppression adjacency within the block, rows=j (suppressor),
        # cols=i (suppressed), only j<i active
        sup = (block_iou(cur, cur) > thresh).astype(jnp.float32) * earlier

        def cond(carry):
            _, changed = carry
            return changed

        def body(carry):
            ck, _ = carry
            suppressed = jnp.max(ck[:, :, None] * sup, axis=1)  # (B,128)
            nk = entry * (1.0 - suppressed)
            return nk, jnp.any(nk != ck)

        ck, _ = jax.lax.while_loop(cond, body, (entry, jnp.bool_(True)))
        keep_ref[:, pl.ds(base, BLOCK)] = ck

        @pl.when(jnp.sum(ck) > 0.0)
        def _():
            def later_blocks(bj, _):
                base_j = pl.multiple_of(bj * BLOCK, BLOCK)
                other = load_block(base_j)
                iou_cross = block_iou(cur, other)  # (B, 128cur, 128later)
                suppressed = jnp.max(
                    (iou_cross > thresh).astype(jnp.float32) * ck[:, :, None], axis=1
                )  # (B, 128)
                keep_ref[:, pl.ds(base_j, BLOCK)] = keep_ref[:, pl.ds(base_j, BLOCK)] * (
                    1.0 - suppressed
                )
                return 0

            jax.lax.fori_loop(bi + 1, nb, later_blocks, 0)

        return 0

    jax.lax.fori_loop(0, nb, outer, 0)


def _pad_to_block(n: int) -> int:
    return ((n + BLOCK - 1) // BLOCK) * BLOCK


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=("iou_threshold", "interpret"))
def nms_keep_sorted_batched(
    boxes_sorted: Array,
    valid_sorted: Array,
    iou_threshold: float,
    interpret: Optional[bool] = None,
) -> Array:
    """Greedy-NMS keep mask over score-sorted ``(B, N, 4)`` boxes (Pallas).

    Returns a ``(B, N)`` bool mask. N is padded to a multiple of 128
    internally. Boxes must be sorted by descending score along N per image
    (``lax.top_k`` output order).
    """
    if interpret is None:
        interpret = _use_interpret()
    b, n = boxes_sorted.shape[0], boxes_sorted.shape[1]
    n_pad = _pad_to_block(n)
    coords = jnp.swapaxes(boxes_sorted.astype(jnp.float32), -1, -2)  # (B, 4, N)
    if n_pad != n:
        coords = jnp.pad(coords, ((0, 0), (0, 0), (0, n_pad - n)))
        valid_sorted = jnp.pad(valid_sorted, ((0, 0), (0, n_pad - n)))
    valid_f = valid_sorted.astype(jnp.float32)

    # grid over batch chunks: the kernel's intermediates are O(BB·128·128),
    # so an unbounded batch block blows the 16 MB scoped-VMEM limit (seen at
    # B=64, N=1024); 16 images per program keeps it ~1 MB while the grid
    # pipelines chunks
    bb = min(b, 16)
    b_pad = ((b + bb - 1) // bb) * bb
    if b_pad != b:
        coords = jnp.pad(coords, ((0, b_pad - b), (0, 0), (0, 0)))
        valid_f = jnp.pad(valid_f, ((0, b_pad - b), (0, 0)))

    keep = pl.pallas_call(
        _nms_kernel,
        grid=(b_pad // bb,),
        out_shape=jax.ShapeDtypeStruct((b_pad, n_pad), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bb, 4, n_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, n_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, n_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(jnp.asarray([iou_threshold], jnp.float32), coords, valid_f)
    return keep[:b, :n] > 0.5


def nms_keep_sorted(
    boxes_sorted: Array,
    valid_sorted: Array,
    iou_threshold: float,
    interpret: Optional[bool] = None,
) -> Array:
    """Single-image ``(N, 4)`` variant of :func:`nms_keep_sorted_batched`."""
    return nms_keep_sorted_batched(
        boxes_sorted[None], valid_sorted[None], iou_threshold, interpret=interpret
    )[0]


def nms_keep_sorted_multilevel(
    boxes_list,
    valid_list,
    iou_threshold: float,
    interpret: Optional[bool] = None,
):
    """Per-level greedy-NMS keep masks in ONE kernel call.

    FPN levels never suppress each other, so per-level NMS is independent —
    the shipping RPN path issued one :func:`nms_keep_sorted_batched` per
    level (5 calls at serving shapes). Each in-graph kernel call costs ~87 µs
    of fixed overhead plus pipeline drain (docs/kernel-notebook.md §NMS), so
    the levels are instead stacked on the batch axis — (L·B, N_max) rows,
    shorter levels padded with invalid slots — and suppressed in a single
    call whose grid pipelines all L·B images.

    Args:
      boxes_list: per level ``(B, N_l, 4)`` score-descending boxes.
      valid_list: per level ``(B, N_l)`` bool.

    Returns:
      List of per-level ``(B, N_l)`` bool keep masks — bit-identical to
      per-level :func:`nms_keep_sorted_batched` calls (pad slots are invalid
      and greedy NMS never lets an invalid row suppress anything).
    """
    assert len(boxes_list) == len(valid_list) and boxes_list
    if len(boxes_list) == 1:
        return [
            nms_keep_sorted_batched(
                boxes_list[0], valid_list[0], iou_threshold, interpret=interpret
            )
        ]
    b = boxes_list[0].shape[0]
    # ADVICE r4: level-stacking on the batch axis silently assumes every
    # level shares the batch size (true at the RPN call site) — assert it.
    assert all(bx.shape[0] == b for bx in boxes_list), (
        "all levels must share batch size: "
        f"{[bx.shape[0] for bx in boxes_list]}"
    )
    n_max = max(bx.shape[1] for bx in boxes_list)
    stacked_b, stacked_v = [], []
    for bx, v in zip(boxes_list, valid_list):
        pad = n_max - bx.shape[1]
        if pad:
            bx = jnp.pad(bx, ((0, 0), (0, pad), (0, 0)))
            v = jnp.pad(v, ((0, 0), (0, pad)))
        stacked_b.append(bx)
        stacked_v.append(v)
    keep = nms_keep_sorted_batched(
        jnp.concatenate(stacked_b, axis=0),
        jnp.concatenate(stacked_v, axis=0),
        iou_threshold,
        interpret=interpret,
    )
    return [
        keep[i * b : (i + 1) * b, : boxes_list[i].shape[1]]
        for i in range(len(boxes_list))
    ]


def nms_select_pallas(
    boxes: Array,
    scores: Array,
    iou_threshold: float,
    max_out: int,
    valid: Optional[Array] = None,
    interpret: Optional[bool] = None,
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
    interpret: Optional[bool] = None,
) -> Tuple[Array, Array]:
    """Class/level-aware variant via the coordinate-offset trick
    (reference ``batched_nms``, ``utils.py:96-119``)."""
    if valid is not None:
        safe = jnp.where(valid[:, None], boxes, 0.0)
    else:
        safe = boxes
    max_coordinate = jnp.max(safe)
    offsets = idxs.astype(boxes.dtype) * (max_coordinate + 1.0)
    return nms_select_pallas(
        boxes + offsets[:, None], scores, iou_threshold, max_out, valid=valid, interpret=interpret
    )


def batch_class_aware_keep(
    boxes: Array,
    scores_sorted: Array,
    classes: Array,
    iou_threshold: float,
    valid: Array,
    interpret: Optional[bool] = None,
) -> Array:
    """Keep mask for a score-sorted ``(B, N, 4)`` candidate set with class
    ids ``(B, N)`` — class-aware via coordinate offsets, whole batch in one
    kernel call. Used by the detectors' final NMS."""
    safe = jnp.where(valid[..., None], boxes, 0.0)
    max_coordinate = jnp.max(safe)
    offsets = classes.astype(boxes.dtype) * (max_coordinate + 1.0)
    shifted = boxes + offsets[..., None]
    return nms_keep_sorted_batched(shifted, valid, iou_threshold, interpret=interpret)
