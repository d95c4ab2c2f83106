"""Pallas TPU kernel for multi-level ROIAlign — window-DMA + MXU interp.

The XLA gather formulation (``detax.ops.roi_align.multiscale_roi_align``) is
bound by TPU gather row rate (~20M rows/s measured on v5e): 7x7xr² samples
per box x thousands of proposals = hundreds of thousands of row fetches per
batch.  This kernel exploits the structure FPN level assignment guarantees: a
box at its assigned level spans < 28 feature cells per side
(``s/stride ∈ [14, 28)`` between the canonical thresholds, ≤ map size at the
clamped ends — reference ``assign_boxes_to_levels``,
``roi_poolers.py:103-131``), so every box's entire bilinear footprint fits a
fixed window of cells:

  per box, ONE strided DMA copies the (32, 40, C) window HBM→VMEM (ALL of
  a program's windows are issued up front and stay resident — v3; the
  rolling-ring v2 spent ~980 cy/box re-deriving descriptors and branching
  over levels twice per box), and the pooled 7x7 bilinear reduce collapses
  to a single MXU matmul

      out = M @ win_flat,   M = kron(Wy, Wx) ∈ (56, 1280),
                            win_flat = window.reshape(32·40, C)

  where Wy (8x32) / Wx (7x40) are the per-axis *pooled* bilinear weight rows
  (bin-averaged over the r sub-samples — pooling is linear, so folding it
  into the weights is exact).  Wy/Wx are precomputed exactly in XLA
  (fp32, torchvision border/edge rules) and streamed in pre-expanded row
  form; the kron expansion along the 1280 lanes happens in-kernel:
  ``a1 = pltpu.repeat(wx56, 32, lanes)`` (tile pattern, j % 40) and
  ``a2 = wy56 @ T`` with the constant 0/1 block-selector ``T[y, j] =
  (j // 40 == y)`` — the block pattern Mosaic's tile-semantics repeat can't
  produce.

Mosaic constraints honoured (probed on this toolchain):
  - reshapes may only collapse leading dims into sublanes
    (``(32,40,128)→(1280,128)`` ok; anything merging into the 128-lane dim
    is rejected), no 3-D ``dot_general``;
  - manual-DMA slices must cover whole lane tiles → channels are padded to
    a multiple of 128 by the wrapper;
  - for sub-fp32 dtypes the second-to-last dim is sublane-tiled (8), so the
    window's x-origin must be provably 8-aligned → x0 is rounded down to a
    multiple of 8 (``pl.multiple_of``) and the x-window is 40 wide
    (28-cell span + bilinear margin + ≤7 alignment drift);
  - fp32 inputs must not be decomposed into bf16 MXU passes (the default!)
    → the fp32 path requests ``Precision.HIGHEST`` (it is the parity/test
    path; serving runs bf16 at the fast default).

Semantics are identical to the gather path / torchvision ``roi_align``
(aligned=True, fixed sampling_ratio) except for the window-fitting level
assignment (``max_side_cells = 28``) which only affects aspect-ratio ≳ 2
boxes near level boundaries — verified in tests against the same oracles.
Levels whose padded maps are smaller than the window are zero-padded by the
host-side wrapper.
"""

from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WIN_Y = 32  # rows: offset-free (leading dim), 28-cell span + margin
WIN_X = 40  # cols: 28-cell span + margin + ≤7 cells of 8-alignment drift
X_ALIGN = 8
BOXES_PER_PROGRAM = 24  # ring == p: every window resident in VMEM at once
RESIDENT_VMEM_BUDGET = 12 * 1024 * 1024  # v4 map-resident path eligibility
# Rejected kernel generations (v5 packed-resident, v6 two-chained-matmul,
# v7 sorted-segment) are retired — measurements and why each lost live in
# docs/kernel-notebook.md.
# v8 image-resident packed kernel (default): windows sliced directly from a
# double-buffered VMEM-resident composite map — see _kernel_factory_packed_v8
RESIDENT_V8 = True
# estimated (buffers + M scratch) ceiling for v8 eligibility; the actual
# Mosaic scoped allocation adds ~5 MB of expansion intermediates and block
# double-buffering, covered by the raised per-kernel limit below
V8_VMEM_BUDGET = 20 * 1024 * 1024
V8_VMEM_LIMIT = 32 * 1024 * 1024  # per-kernel scoped-vmem limit (chip has 128M)
_PH = 7  # kernel is specialised for 7x7 output (the reference contract)
_ROWS = 56  # padded kron rows: 8 (padded ph) x 7 (pw)
_WIN_YP = WIN_Y // 2  # packed window rows (y pairs in lanes), c<=64 path


def _expand_rows(p: int, wy_vals, wx_val, precision, ph_pad: int = 8, pw: int = _PH):
    """In-kernel kron-row expansion from COMPACT per-axis weights.

    The wrapper ships wy as (p·ph_pad, Wy) and wx as (p·pw, Wx) — the
    rows = ph_pad·pw expansions (row j of box b: wy[b·ph_pad + j//pw],
    wx[b·pw + j%pw]) are built HERE with one-hot selector matmuls (exact
    row copies in any dtype, so numerics are identical to shipping
    pre-expanded rows).  Shipping compact rows cuts the per-box weight DMA
    3.7× and — the real win — deletes the XLA-side repeat/tile
    materialisation + relayout copies of ~600 MB of expanded weights per
    b128 batch (~10 ms measured in the round-3 HLO audit).
    """
    rows = ph_pad * pw
    ry = jax.lax.broadcasted_iota(jnp.int32, (p * rows, p * ph_pad), 0)
    cy = jax.lax.broadcasted_iota(jnp.int32, (p * rows, p * ph_pad), 1)
    sy = (cy == (ry // rows) * ph_pad + (ry % rows) // pw).astype(wy_vals[0].dtype)
    rx = jax.lax.broadcasted_iota(jnp.int32, (p * rows, p * pw), 0)
    cx = jax.lax.broadcasted_iota(jnp.int32, (p * rows, p * pw), 1)
    sx = (cx == (rx // rows) * pw + (rx % rows) % pw).astype(wx_val.dtype)
    wy56 = [
        jnp.dot(sy, w, preferred_element_type=jnp.float32, precision=precision
                ).astype(w.dtype)
        for w in wy_vals
    ]
    wx56 = jnp.dot(
        sx, wx_val, preferred_element_type=jnp.float32, precision=precision
    ).astype(wx_val.dtype)
    return wy56, wx56


def _kernel_factory(num_levels: int, c: int, c_out: int, p: int, out_dtype):
    def kernel(ints_ref, wy_ref, wx_ref, t_ref, *refs):
        # refs: num_levels feature refs (ANY/HBM), out_ref,
        #       window scratch (p, WIN_Y, WIN_X, C), m scratch, sems
        feat_refs = refs[:num_levels]
        out_ref = refs[num_levels]
        window = refs[num_levels + 1]
        m_scr = refs[num_levels + 2]
        sems = refs[num_levels + 3]

        def start_dma(j):
            bidx = ints_ref[j, 0]
            y0 = ints_ref[j, 1]
            # x0 is pre-aligned on the host side; re-derive the alignment in
            # kernel so Mosaic can prove divisibility by the sublane tiling
            x0 = pl.multiple_of((ints_ref[j, 2] // X_ALIGN) * X_ALIGN, X_ALIGN)
            level = ints_ref[j, 3]
            for l in range(num_levels):
                @pl.when(level == l)
                def _():
                    pltpu.make_async_copy(
                        feat_refs[l].at[bidx, pl.ds(y0, WIN_Y), pl.ds(x0, WIN_X), :],
                        window.at[j],
                        sems.at[j],
                    ).start()

        def wait_dma(j):
            # every level's window slice has identical shape/dtype, so the
            # semaphore wait (which only needs the byte count) can use a
            # level-independent descriptor — no per-level branching here
            pltpu.make_async_copy(
                feat_refs[0].at[0, pl.ds(0, WIN_Y), pl.ds(0, WIN_X), :],
                window.at[j],
                sems.at[j],
            ).wait()

        # fp32 inputs (the parity/test path) must not be decomposed into
        # bf16 MXU passes — request HIGHEST; bf16 inputs (serving) keep the
        # fast default.
        precision = (
            jax.lax.Precision.HIGHEST
            if jnp.dtype(out_dtype) == jnp.float32
            else jax.lax.Precision.DEFAULT
        )

        # On the bf16 serving path the whole M build runs in bf16 (a fp32
        # matmul on the MXU decomposes into several bf16 passes and would
        # cost as much as the main matmul; M is cast to bf16 for the main
        # matmul anyway, so nothing is lost).  T is 0/1 — exact in bf16.
        mm_dtype = jnp.float32 if jnp.dtype(out_dtype) == jnp.float32 else out_dtype

        # issue EVERY window DMA up front: the per-box dependency chains in
        # the compute loop below are then pure wait+matmul (the v2 kernel's
        # rolling 6-deep ring re-derived descriptors and branched over
        # levels twice per box, which dominated its ~980 cy/box overhead)
        for j in range(p):
            start_dma(j)

        # kron build for the WHOLE program's boxes up front: the selector
        # matmul over many-box row blocks runs at full MXU row occupancy (vs
        # 56/128 per box) and drops two ops from every per-box dependency
        # chain.  Built in row chunks into a VMEM scratch — one-shot values
        # (a1, a2 fp32 accumulator, m) together blow the 16 MB scoped limit.
        # a1[i, j] = wx[i, j % WIN_X] (pltpu.repeat has TILE semantics on the
        # lane axis); a2[i, j] = wy[i, j // WIN_X] via the 0/1 block-selector.
        (wy56,), wx56 = _expand_rows(
            p, [wy_ref[:].astype(mm_dtype)], wx_ref[:].astype(mm_dtype), precision
        )
        chunk = max(1, p // 4) * _ROWS
        for q in range(0, p * _ROWS, chunk):
            a1 = pltpu.repeat(wx56[q:q + chunk, :], WIN_Y, axis=1)
            a2 = jnp.dot(
                wy56[q:q + chunk, :],
                t_ref[:].astype(mm_dtype),
                preferred_element_type=jnp.float32,  # MXU acc must be 32-bit
                precision=precision,
            )
            m_scr[q:q + chunk, :] = a1 * a2.astype(mm_dtype)

        def compute(j):
            m = m_scr[j * _ROWS:(j + 1) * _ROWS, :]  # j is a Python int here
            win = window[j].reshape(WIN_Y * WIN_X, c)
            out = jnp.dot(
                m.astype(win.dtype),
                win,
                preferred_element_type=jnp.float32,
                precision=precision,
            )  # (56, C)
            out_ref[pl.ds(j * _ROWS, _ROWS), :] = out[:, :c_out].astype(out_dtype)

        # fully unrolled: j is a compile-time constant, so scratch indexing
        # is static and Mosaic can software-pipeline the independent
        # per-box wait→matmul chains
        for j in range(p):
            wait_dma(j)
            compute(j)

    return kernel


def _kernel_factory_packed(
    num_levels: int, c_out: int, p: int, out_dtype, ph_pad: int = 8, pw: int = _PH
):
    """Y-pair-packed kernel for c_out ≤ 64: the feature maps are stored as
    ``(B, H/2, W, 128)`` with row pairs interleaved into the lanes
    (lane = parity·64 + channel), so each box's window DMA moves
    (16, 40, 128) — HALF the bytes of the c-padded (32, 40, 128) window.
    The probe series showed the kernel is DMA-bytes-bound (38.65 of 39 ms
    at b128 serving shapes), so bytes ≈ time.

    The pooled reduce stays two MXU matmuls with the SAME total K tiles as
    the unpacked kernel (2 × K=640 vs 1 × K=1280): M_even applies the
    even-row bilinear weights (correct in the parity-0 lane half), M_odd
    the odd-row weights (correct in the parity-1 half), and the halves are
    combined with a 64-lane fp32 roll + add.

    Generic over the pooled output size: ``ph_pad`` (ph rounded up to the
    8-sublane tile) × ``pw`` kron rows per box — (8, 7) for the box head,
    (16, 14) for the mask/keypoint poolers."""
    rows = ph_pad * pw

    def kernel(ints_ref, wye_ref, wyo_ref, wx_ref, t_ref, *refs):
        feat_refs = refs[:num_levels]
        out_ref = refs[num_levels]
        window = refs[num_levels + 1]  # (p, WIN_YP, WIN_X, 128)
        # ONE scratch holding box j's even M half at rows [j·2·rows, +rows)
        # and its odd half at [j·2·rows+rows, +rows): the matmul operand is
        # then a direct contiguous slice — the previous two-scratch layout
        # needed a per-box concatenate that materialized an extra
        # (2·rows, K) copy (~143 KB/box ≈ 5.5 GB/batch of VMEM traffic).
        m_scr = refs[num_levels + 2]
        sems = refs[num_levels + 3]

        def start_dma(j):
            bidx = ints_ref[j, 0]
            y0p = ints_ref[j, 1]  # packed-row origin (= y0 / 2)
            x0 = pl.multiple_of((ints_ref[j, 2] // X_ALIGN) * X_ALIGN, X_ALIGN)
            level = ints_ref[j, 3]
            for l in range(num_levels):
                @pl.when(level == l)
                def _():
                    pltpu.make_async_copy(
                        feat_refs[l].at[bidx, pl.ds(y0p, _WIN_YP), pl.ds(x0, WIN_X), :],
                        window.at[j],
                        sems.at[j],
                    ).start()

        def wait_dma(j):
            pltpu.make_async_copy(
                feat_refs[0].at[0, pl.ds(0, _WIN_YP), pl.ds(0, WIN_X), :],
                window.at[j],
                sems.at[j],
            ).wait()

        for j in range(p):
            start_dma(j)

        precision = (
            jax.lax.Precision.HIGHEST
            if jnp.dtype(out_dtype) == jnp.float32
            else jax.lax.Precision.DEFAULT
        )
        mm_dtype = jnp.float32 if jnp.dtype(out_dtype) == jnp.float32 else out_dtype

        (wye56, wyo56), wx56 = _expand_rows(
            p,
            [wye_ref[:].astype(mm_dtype), wyo_ref[:].astype(mm_dtype)],
            wx_ref[:].astype(mm_dtype),
            precision,
            ph_pad=ph_pad,
            pw=pw,
        )

        # SOFTWARE PIPELINE: build box j+1's m matrices between box j's two
        # MXU matmuls. The phase-separated layout (all m-builds, then all
        # matmuls) left the VPU idle through the matmul loop and the MXU
        # idle through the m-build — measured 30.9 ms with m-build ~11 ms
        # and matmuls ~11 ms nearly back-to-back (round-3 probe). The
        # per-box chunks are independent (disjoint scratch rows), so Mosaic
        # can dual-issue VPU work of iteration j+1 against MXU work of j.
        def build_m(j):
            q = j * rows
            a1 = pltpu.repeat(wx56[q:q + rows, :], _WIN_YP, axis=1)
            for half, wexp in enumerate((wye56, wyo56)):
                a2 = jnp.dot(
                    wexp[q:q + rows, :],
                    t_ref[:].astype(mm_dtype),
                    preferred_element_type=jnp.float32,
                    precision=precision,
                )
                dst = j * 2 * rows + half * rows
                m_scr[dst:dst + rows, :] = a1 * a2.astype(mm_dtype)

        build_m(0)
        for j in range(p):
            if j + 1 < p:
                build_m(j + 1)
            wait_dma(j)
            win = window[j].reshape(_WIN_YP * WIN_X, 128)
            # ONE (2·rows, 640) @ (640, 128) matmul per box: stacking the
            # even- and odd-row M halves along sublanes near-doubles MXU row
            # fill and reads the window operand once instead of twice —
            # measured ~-4 ms on the 30.9 ms kernel at b128 serving shapes
            # vs the two-matmul form. The halves are already adjacent in
            # m_scr, so the operand is a contiguous slice (no concat copy).
            m2 = m_scr[j * 2 * rows:(j + 1) * 2 * rows, :].astype(win.dtype)
            o2 = jnp.dot(
                m2, win, preferred_element_type=jnp.float32, precision=precision
            )  # (2·rows, 128): [0,rows) parity-0 half valid, rest parity-1
            o = o2[:rows] + pltpu.roll(o2[rows:], 64, axis=1)  # fp32 roll
            out_ref[pl.ds(j * rows, rows), :] = o[:, :c_out].astype(out_dtype)

    return kernel


def _compose_layout(shapes):
    """Pack the per-level packed map shapes [(Hl_packed, Wl_pad), ...] into
    ONE composite buffer: levels wider than half the max width stack
    full-width; the narrow ones fill two side-by-side columns (greedy by
    height).  Returns per-level (row_off, col_off) and (H_big, W_big).
    Column offsets are X_ALIGN-aligned so absorbed x-origins stay provably
    aligned for the window slice."""
    w_big = max(w for _, w in shapes)
    half = w_big // 2
    order = sorted(range(len(shapes)), key=lambda i: -shapes[i][1])
    offs = [None] * len(shapes)
    row = 0
    narrow = []
    for i in order:
        h, w = shapes[i]
        if w > half:
            offs[i] = (row, 0)
            row += h
        else:
            narrow.append(i)
    coff2 = 0
    if narrow:
        max_nw = max(shapes[i][1] for i in narrow)
        coff2 = -(-max_nw // X_ALIGN) * X_ALIGN
    two_col = narrow and (coff2 + max(shapes[i][1] for i in narrow) <= w_big)
    h1 = h2 = 0
    for i in narrow:
        h, w = shapes[i]
        if two_col and h2 + h <= h1:
            offs[i] = (row + h2, coff2)
            h2 += h
        else:
            offs[i] = (row + h1, 0)
            h1 += h
    return offs, (max(row + max(h1, h2), _WIN_YP), w_big)


def _kernel_factory_packed_v8(
    num_levels: int,
    c_out: int,
    p: int,
    out_dtype,
    map_shapes,  # per level (Hl_packed, Wl_pad) of the packed feature refs
    offsets,  # per level (row_off, col_off) inside the composite buffer
    big_shape,  # (H_big, W_big) of the composite buffer
    n_images: int,
    ph_pad: int = 8,
    pw: int = _PH,
):
    """v8: image-resident packed kernel with double-buffered prefetch.

    The v3 per-box window DMAs are ROW-RATE-bound, not byte-bound: 38.4k
    boxes × 16 strided rows = 614k DMA rows at the measured ~40M rows/s
    ≈ 15 ms, and halving the bytes per row (int8 windows, q8 experiment)
    changed nothing; a VMEM→VMEM window copy hits the same row rate
    (probe: 13.8 vs 13.7 ms).  Direct dynamic-offset SLICES of a
    VMEM-resident map, by contrast, run 2.2× faster than any window copy
    (6.2 vs 13.7 ms incl. identical matmuls), so v8 keeps windows out of
    the DMA engine entirely:

    - the resident unit is the IMAGE: all levels' packed maps are DMA'd
      (~156 rows/image vs 16 rows/box × 300 boxes) into ONE composite
      VMEM buffer, laid out by :func:`_compose_layout`; the per-level
      row/col offsets are absorbed into each box's (y0p, x0) on the XLA
      side, so the kernel needs no level branching at all;
    - boxes arrive naturally grouped by image (NO sort/unsort — the v7
      sorted-segment experiment spent 10.6 ms on argsort + the un-sort
      gather of the pooled output); the wrapper pads boxes-per-image up to
      a multiple of p so every program serves exactly one image;
    - the image check therefore runs ONCE per program, and the box loop is
      branch-free wait-free slice+matmul — per-box @pl.when segment checks
      were measured to cost ~8.5 ms in Mosaic pipelining (27.1 → 18.7 ms);
    - the next image's maps prefetch into the spare buffer while the
      current image's ~13 programs compute (the v5 resident kernel's
      blocking transition DMA was its downfall).

    SMEM state across grid steps: [0]=resident image, [1]=buffer index,
    [2]=in-flight prefetch image (-1 none).
    """
    rows = ph_pad * pw

    def kernel(ints_ref, wye_ref, wyo_ref, wx_ref, t_ref, *refs):
        feat_refs = refs[:num_levels]
        out_ref = refs[num_levels]
        maps = refs[num_levels + 1]  # (2, H_big, W_big, 128)
        state = refs[num_levels + 2]  # SMEM (4,)
        sem_cold = refs[num_levels + 3]
        sem_pf = refs[num_levels + 4]

        @pl.when(pl.program_id(0) == 0)
        def _():
            state[0] = -1
            state[1] = 0
            state[2] = -1

        def image_copies(img, buf, sem):
            cps = []
            for l in range(num_levels):
                hl, wl = map_shapes[l]
                roff, coff = offsets[l]
                cps.append(
                    pltpu.make_async_copy(
                        feat_refs[l].at[img, pl.ds(0, hl), pl.ds(0, wl), :],
                        maps.at[buf, pl.ds(roff, hl), pl.ds(coff, wl), :],
                        sem,
                    )
                )
            return cps

        img = ints_ref[0, 0]  # every box in this program is from this image

        @pl.when(img != state[0])
        def _():
            @pl.when(state[2] == img)
            def _():  # the prefetch was for us — wait and flip buffers
                for cp in image_copies(img, 1 - state[1], sem_pf):
                    cp.wait()
                state[1] = 1 - state[1]

            @pl.when(state[2] != img)
            def _():  # cold start (or defensive: stale prefetch to drain)
                @pl.when(state[2] != -1)
                def _():
                    for cp in image_copies(0, 1 - state[1], sem_pf):
                        cp.wait()  # byte counts match any image's copies
                for cp in image_copies(img, 1 - state[1], sem_cold):
                    cp.start()
                for cp in image_copies(img, 1 - state[1], sem_cold):
                    cp.wait()
                state[1] = 1 - state[1]

            state[0] = img
            state[2] = -1

        @pl.when((state[2] == -1) & (img + 1 < n_images))
        def _():  # prefetch the next image into the spare buffer
            for cp in image_copies(img + 1, 1 - state[1], sem_pf):
                cp.start()
            state[2] = img + 1

        precision = (
            jax.lax.Precision.HIGHEST
            if jnp.dtype(out_dtype) == jnp.float32
            else jax.lax.Precision.DEFAULT
        )
        mm_dtype = jnp.float32 if jnp.dtype(out_dtype) == jnp.float32 else out_dtype

        (wye56, wyo56), wx56 = _expand_rows(
            p,
            [wye_ref[:].astype(mm_dtype), wyo_ref[:].astype(mm_dtype)],
            wx_ref[:].astype(mm_dtype),
            precision,
            ph_pad=ph_pad,
            pw=pw,
        )

        tmat = t_ref[:].astype(mm_dtype)
        buf = state[1]  # loop-invariant: hoisted out of the box loop
        for j in range(p):
            # M is computed straight into vector registers and fed to the
            # MXU — no VMEM scratch round-trip. The scratch-staged form
            # (software-pipelined build_m of box j+1 between box j's
            # matmuls, inherited from the window-DMA kernels) measured
            # 3.3× SLOWER in the v8 setting: the store+load of ~143 KB of
            # M per box moved ~22 GB/batch through VMEM for nothing once
            # the window fetch stopped competing for issue slots.
            q = j * rows
            a1 = pltpu.repeat(wx56[q:q + rows, :], _WIN_YP, axis=1)
            a2e = jnp.dot(
                wye56[q:q + rows, :], tmat,
                preferred_element_type=jnp.float32, precision=precision,
            )
            a2o = jnp.dot(
                wyo56[q:q + rows, :], tmat,
                preferred_element_type=jnp.float32, precision=precision,
            )
            m2 = jnp.concatenate(
                [a1 * a2e.astype(mm_dtype), a1 * a2o.astype(mm_dtype)], axis=0
            )
            y0p = ints_ref[j, 1]  # composite-buffer row (level roff absorbed)
            x0 = pl.multiple_of((ints_ref[j, 2] // X_ALIGN) * X_ALIGN, X_ALIGN)
            win = maps[buf, pl.ds(y0p, _WIN_YP), pl.ds(x0, WIN_X), :]
            win = win.reshape(_WIN_YP * WIN_X, 128)
            o2 = jnp.dot(
                m2.astype(win.dtype), win,
                preferred_element_type=jnp.float32, precision=precision,
            )
            o = o2[:rows] + pltpu.roll(o2[rows:], 64, axis=1)
            out_ref[pl.ds(j * rows, rows), :] = o[:, :c_out].astype(out_dtype)

    return kernel


def _kernel_factory_packed_q8(
    num_levels: int, c_out: int, p: int, out_dtype, ph_pad: int = 8, pw: int = _PH
):
    """int8 variant of the packed kernel: windows arrive as per-level
    per-channel symmetric int8 (quantized by the wrapper), M is built in
    bf16 exactly as the bf16 kernel and rounded to int8 at the scratch
    store, and the per-box reduce is ONE int8×int8→int32 MXU matmul.

    Why: the packed bf16 kernel is bound by total VMEM traffic (window DMA
    writes 6.3 GB + M scratch writes ~11 GB + matmul reads ~17 GB per b128
    batch — the measured phase costs DMA 15.3 / m-build 12.7 / matmul 7.8 ms
    barely overlap because they contend for the same port).  int8 halves the
    window bytes and the M bytes end to end: DMA ~3.2 GB, M ~5.5 GB.

    Numerics: M entries are pooled bilinear weight products in [0, 1],
    quantized with fixed scale 127 (step 1/127 ≈ 2× the bf16 ulp at 1.0);
    features use per-(image, level, channel) amax/127 scales (per-image so
    one image's outputs never depend on which other images share its
    batch).  Dequantization is a single per-lane multiply folded into the
    f32 output (``out = (Mq @ Wq) · s_lane/127``), selected per box by its
    (image, level) segment key from the dequant table.  Exactness of the
    selector-dot weight expansion is unchanged.  Quality is measured
    end-to-end as ΔmAP (scripts/eval_dmap.py profile ``serving_fast_q8``) —
    this is a serving lever, opt-in via ``ROIPoolerConf.impl =
    "pallas_q8"``, never the parity default.
    """
    rows = ph_pad * pw
    pitch = -(-rows // 32) * 32  # int8 sublane tile is 32: align each half

    def kernel(ints_ref, wye_ref, wyo_ref, wx_ref, t_ref, dq_ref, *refs):
        feat_refs = refs[:num_levels]
        out_ref = refs[num_levels]
        window = refs[num_levels + 1]  # (p, WIN_YP, WIN_X, 128) int8
        m_scr = refs[num_levels + 2]  # (p · 2 · pitch, K) int8
        sems = refs[num_levels + 3]

        def start_dma(j):
            bidx = ints_ref[j, 0]
            y0p = ints_ref[j, 1]
            x0 = pl.multiple_of((ints_ref[j, 2] // X_ALIGN) * X_ALIGN, X_ALIGN)
            level = ints_ref[j, 3]
            for l in range(num_levels):
                @pl.when(level == l)
                def _():
                    pltpu.make_async_copy(
                        feat_refs[l].at[bidx, pl.ds(y0p, _WIN_YP), pl.ds(x0, WIN_X), :],
                        window.at[j],
                        sems.at[j],
                    ).start()

        def wait_dma(j):
            pltpu.make_async_copy(
                feat_refs[0].at[0, pl.ds(0, _WIN_YP), pl.ds(0, WIN_X), :],
                window.at[j],
                sems.at[j],
            ).wait()

        for j in range(p):
            start_dma(j)

        precision = jax.lax.Precision.DEFAULT
        mm_dtype = jnp.bfloat16
        (wye56, wyo56), wx56 = _expand_rows(
            p,
            [wye_ref[:].astype(mm_dtype), wyo_ref[:].astype(mm_dtype)],
            wx_ref[:].astype(mm_dtype),
            precision,
            ph_pad=ph_pad,
            pw=pw,
        )

        def build_m(j):
            q = j * rows
            a1 = pltpu.repeat(wx56[q:q + rows, :], _WIN_YP, axis=1)
            for half, wexp in enumerate((wye56, wyo56)):
                a2 = jnp.dot(
                    wexp[q:q + rows, :],
                    t_ref[:].astype(mm_dtype),
                    preferred_element_type=jnp.float32,
                    precision=precision,
                )
                # quantize in f32 (bf16's ulp at 127 is 0.5 — the +0.5
                # round bias must be added in f32), truncate-toward-zero
                # astype == round-half-up since m ≥ 0
                m_f = a1.astype(jnp.float32) * a2
                dst = j * 2 * pitch + half * pitch
                m_scr[dst:dst + rows, :] = (m_f * 127.0 + 0.5).astype(jnp.int8)

        build_m(0)
        for j in range(p):
            if j + 1 < p:
                build_m(j + 1)
            wait_dma(j)
            win = window[j].reshape(_WIN_YP * WIN_X, 128)  # int8
            m2 = m_scr[j * 2 * pitch:(j + 1) * 2 * pitch, :]  # int8, pad rows stale
            o2 = jnp.dot(m2, win, preferred_element_type=jnp.int32)
            # (2·pitch, 128) int32: rows [0,rows) parity-0, [pitch,pitch+rows)
            # parity-1; the inter-half pad rows hold stale-M garbage, unused
            o = o2[:rows] + pltpu.roll(o2[pitch:pitch + rows], 64, axis=1)
            # dequant row = the box's (image, level) segment key
            sel = dq_ref[pl.ds(ints_ref[j, 4], 1), :]
            out = o.astype(jnp.float32) * sel
            out_ref[pl.ds(j * rows, rows), :] = out[:, :c_out].astype(out_dtype)

    return kernel


def _kernel_factory_resident(
    num_levels: int,
    c: int,
    c_out: int,
    p: int,
    out_dtype,
    map_shapes,  # per level (Hl_pad, Wl_pad) of the padded feature refs
):
    """v4: map-resident kernel. Boxes arrive sorted by (image, level); each
    program keeps the current (image, level) feature map whole in VMEM and
    slices windows out of it, so HBM traffic is one map read per (image,
    level) segment instead of one 327 KB window DMA per box. The v3 probe
    measured the per-box window DMAs at 38.65 of the kernel's 39 ms
    (12.6 GB of overlapping reads at b128-serving shapes) — the kernel is
    DMA-bound, and this removes ~92% of the bytes."""
    max_h = max(h for h, _ in map_shapes)
    max_w = max(w for _, w in map_shapes)

    def kernel(ints_ref, wy_ref, wx_ref, t_ref, *refs):
        feat_refs = refs[:num_levels]
        out_ref = refs[num_levels]
        map_scr = refs[num_levels + 1]  # (max_h, max_w, c)
        m_scr = refs[num_levels + 2]
        resident = refs[num_levels + 3]  # SMEM (1,): resident segment key
        sem = refs[num_levels + 4]

        @pl.when(pl.program_id(0) == 0)
        def _():
            resident[0] = -1

        precision = (
            jax.lax.Precision.HIGHEST
            if jnp.dtype(out_dtype) == jnp.float32
            else jax.lax.Precision.DEFAULT
        )
        mm_dtype = jnp.float32 if jnp.dtype(out_dtype) == jnp.float32 else out_dtype

        (wy56,), wx56 = _expand_rows(
            p, [wy_ref[:].astype(mm_dtype)], wx_ref[:].astype(mm_dtype), precision
        )
        chunk = max(1, p // 4) * _ROWS
        for q in range(0, p * _ROWS, chunk):
            a1 = pltpu.repeat(wx56[q:q + chunk, :], WIN_Y, axis=1)
            a2 = jnp.dot(
                wy56[q:q + chunk, :],
                t_ref[:].astype(mm_dtype),
                preferred_element_type=jnp.float32,
                precision=precision,
            )
            m_scr[q:q + chunk, :] = a1 * a2.astype(mm_dtype)

        for j in range(p):
            bidx = ints_ref[j, 0]
            y0 = ints_ref[j, 1]
            x0 = pl.multiple_of((ints_ref[j, 2] // X_ALIGN) * X_ALIGN, X_ALIGN)
            level = ints_ref[j, 3]
            key = ints_ref[j, 4]

            # segment transition: blocking whole-map DMA (rare — once per
            # (image, level) across the whole sorted grid)
            for l, (hl, wl) in enumerate(map_shapes):
                @pl.when((key != resident[0]) & (level == l))
                def _():
                    cp = pltpu.make_async_copy(
                        feat_refs[l].at[bidx],
                        map_scr.at[pl.ds(0, hl), pl.ds(0, wl), :],
                        sem,
                    )
                    cp.start()
                    cp.wait()
            resident[0] = key

            win = map_scr[pl.ds(y0, WIN_Y), pl.ds(x0, WIN_X), :]
            win = win.reshape(WIN_Y * WIN_X, c)
            m = m_scr[j * _ROWS:(j + 1) * _ROWS, :]
            out = jnp.dot(
                m.astype(win.dtype),
                win,
                preferred_element_type=jnp.float32,
                precision=precision,
            )
            out_ref[pl.ds(j * _ROWS, _ROWS), :] = out[:, :c_out].astype(out_dtype)

    return kernel, (max_h, max_w)


def _axis_weights(start, binsz, origin, size, ph, r, width):
    """Pooled per-axis bilinear weight rows, exact torchvision semantics.

    start/binsz/origin/size: (N,) box geometry in feature coords (global).
    Returns (N, ph, width) fp32: row py = (1/r) Σ_sub bilinear taps of the
    r sub-samples of bin py, indexed window-relative.
    """
    n = start.shape[0]
    s = ph * r
    q = jnp.arange(s, dtype=jnp.float32)
    qb = jnp.floor(q / r)
    qs = q - qb * r
    g = start[:, None] + binsz[:, None] * (qb + (qs + 0.5) / r)[None, :]  # (N, S)
    in_range = (g >= -1.0) & (g <= size[:, None])
    gc = jnp.maximum(g, 0.0)
    low = jnp.floor(gc)
    at_edge = low >= size[:, None] - 1.0
    low = jnp.where(at_edge, size[:, None] - 1.0, low)
    high = jnp.where(at_edge, low, low + 1.0)
    gc = jnp.where(at_edge, low, gc)
    frac = gc - low
    w_low = jnp.where(in_range, 1.0 - frac, 0.0)
    w_high = jnp.where(in_range, frac, 0.0)
    low_w = jnp.clip(low - origin[:, None], 0.0, width - 1.0)
    high_w = jnp.clip(high - origin[:, None], 0.0, width - 1.0)
    cols = jnp.arange(width, dtype=jnp.float32)[None, None, :]
    a = w_low[..., None] * (cols == low_w[..., None]) + w_high[..., None] * (
        cols == high_w[..., None]
    )  # (N, S, width)
    return a.reshape(n, ph, r, width).mean(axis=2)


def multiscale_roi_align_pallas(
    features: Sequence[Array],
    boxes: Array,
    strides: Sequence[int],
    output_size: Tuple[int, int] = (7, 7),
    sampling_ratio: int = 2,
    canonical_box_size: int = 224,
    canonical_level: int = 4,
    interpret: bool | None = None,
    keep_ph_pad: bool = False,
    quantize: bool = False,
) -> Array:
    """Differentiable Pallas ROIAlign: KERNEL forward, GATHER-path backward.

    ``pallas_call`` with scratch/DMA semantics has no JVP rule on TPU, so the
    kernel is wrapped in a ``jax.custom_vjp`` whose backward is the VJP of
    the XLA gather pooler evaluated with the kernel's own window-fitting
    level assignment (``max_side_cells=28``) — the two are semantic twins,
    so this is the exact gradient of the kernel's pooling function (up to
    bf16 rounding). Training therefore runs through the SAME pooler that
    serves (kills the round-3 train/serve skew at
    ``models/faster_rcnn.py::train_forward``). The int8 ``quantize`` path
    gets the same backward (a straight-through estimator through the
    quantization). See :func:`_multiscale_roi_align_pallas_impl` for the
    kernel itself and the full parameter docs.
    """
    f = _trainable_pallas_pool(
        tuple(int(s) for s in strides), (int(output_size[0]), int(output_size[1])),
        int(sampling_ratio), int(canonical_box_size), int(canonical_level),
        interpret, bool(keep_ph_pad), bool(quantize),
    )
    return f(tuple(features), boxes)


@functools.lru_cache(maxsize=None)
def _trainable_pallas_pool(
    strides, output_size, sampling_ratio, canonical_box_size, canonical_level,
    interpret, keep_ph_pad, quantize,
):
    ph, pw = output_size
    ph_pad = -(-ph // 8) * 8

    @jax.custom_vjp
    def pool(feats, boxes):
        return _multiscale_roi_align_pallas_impl(
            list(feats), boxes, list(strides), output_size=output_size,
            sampling_ratio=sampling_ratio, canonical_box_size=canonical_box_size,
            canonical_level=canonical_level, interpret=interpret,
            keep_ph_pad=keep_ph_pad, quantize=quantize,
        )

    def fwd(feats, boxes):
        return pool(feats, boxes), (feats, boxes)

    def bwd(res, g):
        feats, boxes = res

        def gather_twin(feats_, boxes_):
            from detax.ops.roi_align import multiscale_roi_align

            out = multiscale_roi_align(
                list(feats_), boxes_, list(strides), output_size=output_size,
                sampling_ratio=sampling_ratio, aligned=True,
                canonical_box_size=canonical_box_size,
                canonical_level=canonical_level, max_side_cells=28,
            )
            if keep_ph_pad:
                out = jnp.pad(
                    out, ((0, 0), (0, 0), (0, ph_pad - ph), (0, 0), (0, 0))
                )
            return out

        _, vjp = jax.vjp(gather_twin, feats, boxes)
        return vjp(g)

    pool.defvjp(fwd, bwd)
    return pool


def _multiscale_roi_align_pallas_impl(
    features: Sequence[Array],
    boxes: Array,
    strides: Sequence[int],
    output_size: Tuple[int, int] = (7, 7),
    sampling_ratio: int = 2,
    canonical_box_size: int = 224,
    canonical_level: int = 4,
    interpret: bool | None = None,
    keep_ph_pad: bool = False,
    quantize: bool = False,
) -> Array:
    """Drop-in for :func:`detax.ops.roi_align.multiscale_roi_align`
    (aligned=True path) backed by the window-DMA kernel.

    features: per-level ``(B, Hl, Wl, C)``; boxes ``(B, R, 4)`` →
    ``(B, R, ph, pw, C)``.

    keep_ph_pad: return ``(B, R, 8, pw, C)`` with the zero pad row kept.
    The kernel emits 8 pooled rows per box (row 7 is exactly zero — its
    y-weights are the wy8 zero-pad row); slicing it off costs XLA a
    reshape + slice + relayout chain (~4.7 ms at b128 serving shapes,
    round-3 HLO audit). A flatten-consuming box head can instead keep the
    row and pad its fc0 kernel with 448 dead rows (zero activations make
    their values irrelevant) — see
    :func:`detax.models.roi_heads.pad_box_head_params_for_ph_pad`.

    quantize: int8 serving lever (``impl="pallas_q8"``): feature windows are
    quantized per-(level, channel) to symmetric int8 and the per-box reduce
    runs as an int8 MXU matmul with dequantization folded into the output —
    see :func:`_kernel_factory_packed_q8`. Packed (c ≤ 64) non-f32 only.
    """
    from detax.ops.roi_align import assign_boxes_to_levels

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ph, pw = output_size
    # packed kernel is generic over the pooled size (box head 7×7, mask/
    # keypoint 14×14 — ph padded to the 8-sublane tile); the unpacked c>64
    # and map-resident variants remain 7×7-specialised
    assert ph == pw and ph in (_PH, 14), f"unsupported pooled size {output_size}"
    ph_pad = -(-ph // 8) * 8
    rows = ph_pad * pw
    b, r_boxes = boxes.shape[0], boxes.shape[1]
    c = features[0].shape[-1]
    dtype = features[0].dtype
    r = sampling_ratio
    levels = [int(math.log2(s)) for s in strides]
    min_level, max_level = levels[0], levels[-1]
    num_levels = len(features)

    # pad small maps so the window always exists, pad widths to X_ALIGN (the
    # x0 clip bound pad_w - WIN_X must itself be 8-aligned, else the aligned
    # window stops short of the right edge and edge-box taps get clipped to
    # the wrong column), and pad channels to the 128-lane tile (Mosaic:
    # manual-DMA slices must cover whole lane tiles).
    #
    # c ≤ 64 (the FPN serving case) takes the Y-PAIR-PACKED path: row pairs
    # interleave into the 128 lanes, halving every window DMA (the kernel is
    # DMA-bytes-bound — see _kernel_factory_packed).
    use_packed = c <= 64
    c_pad = 128 if use_packed else -(-c // 128) * 128
    feats = []
    pad_hs, pad_ws = [], []
    for f in features:
        if use_packed:
            # height padded EVEN (row pairs) and ≥ WIN_Y
            hp = max(WIN_Y, f.shape[1] + (f.shape[1] & 1))
        else:
            hp = max(WIN_Y, f.shape[1])
        wp = max(WIN_X, -(-f.shape[2] // X_ALIGN) * X_ALIGN)
        cp = 64 if use_packed else c_pad
        if (hp, wp, cp) != f.shape[1:]:
            f = jnp.pad(
                f, ((0, 0), (0, hp - f.shape[1]), (0, wp - f.shape[2]), (0, cp - c))
            )
        if use_packed:
            f = (
                f.reshape(b, hp // 2, 2, wp, 64)
                .transpose(0, 1, 3, 2, 4)
                .reshape(b, hp // 2, wp, 128)
            )
        pad_hs.append(hp)
        pad_ws.append(wp)
        feats.append(f)

    is_f32 = jnp.dtype(dtype) == jnp.float32
    quantize = quantize and use_packed and not is_f32
    dq_tab = None
    if quantize:
        # symmetric per-(IMAGE, level, channel) int8: per-image amax keeps
        # each image's quantization independent of which other images share
        # its serving batch (a whole-batch amax made outputs depend on batch
        # composition). The packed lane layout is (parity·64 + channel), so
        # the amax — and therefore the scale — must agree across the two
        # parity lanes of a channel for the kernel's post-roll sum to
        # dequantize with one per-lane multiply.
        qfeats, dq_rows = [], []
        for f in feats:
            a = jnp.max(jnp.abs(f.astype(jnp.float32)), axis=(1, 2))  # (B, 128)
            ach = jnp.maximum(jnp.maximum(a[:, :64], a[:, 64:]), 1e-8)
            s_lane = jnp.concatenate([ach, ach], axis=1) * (1.0 / 127.0)
            qfeats.append(
                jnp.clip(
                    jnp.round(f.astype(jnp.float32) / s_lane[:, None, None, :]),
                    -127,
                    127,
                ).astype(jnp.int8)
            )
            dq_rows.append(s_lane * (1.0 / 127.0))  # (B, 128); M has its own 1/127
        feats = qfeats
        # row (img·num_levels + level) == the box's seg_key — the kernel
        # selects its dequant row with one dynamic read
        dq_tab = jnp.stack(dq_rows, axis=1).reshape(b * num_levels, 128)
        pad_rows = -(-dq_tab.shape[0] // 8) * 8 - dq_tab.shape[0]
        if pad_rows:
            dq_tab = jnp.pad(dq_tab, ((0, pad_rows), (0, 0)))

    # program size (also needed for the v8 per-image box padding below):
    # fp32 (parity path) uses double the bytes everywhere — halve it so the
    # scratches fit scoped VMEM; larger pooled sizes scale the per-box kron
    # scratch by rows/56, so scale p down to match. p must be a multiple of
    # 8 (Mosaic: SMEM/VMEM block sublane extents divisible by 8).
    p = max(2, (BOXES_PER_PROGRAM * 8 * _PH) // rows) // (2 if is_f32 else 1)
    p = max(8, p - p % 8)

    # v8 (default packed path): image-resident composite map, double-buffered
    offsets = big_shape = map_shapes_v8 = None
    use_v8 = RESIDENT_V8 and use_packed and not quantize and not is_f32
    if use_v8:
        map_shapes_v8 = [(f.shape[1], f.shape[2]) for f in feats]
        offsets, big_shape = _compose_layout(map_shapes_v8)
        esz = jnp.dtype(dtype).itemsize
        p_v8 = min(p, 16)  # measured faster than 24 at serving shapes (and
        # 16 | 256 → zero per-image padding for the serving profile)
        vmem_v8 = (
            2 * big_shape[0] * big_shape[1] * 128 * esz
            + p_v8 * 2 * rows * _WIN_YP * WIN_X * esz
        )
        use_v8 = vmem_v8 <= V8_VMEM_BUDGET
        if use_v8:
            p = p_v8
    r_out = r_boxes
    if use_v8 and r_boxes % p:
        # pad boxes-per-image to a multiple of p so every kernel program
        # serves exactly one image (the image-residency check runs once per
        # program); pad outputs are sliced off at the end
        rp = -(-r_boxes // p) * p
        boxes = jnp.pad(jnp.nan_to_num(boxes), ((0, 0), (0, rp - r_boxes), (0, 0)))
        r_boxes = rp

    heights = jnp.array([f.shape[1] for f in features], jnp.float32)  # true extents
    widths = jnp.array([f.shape[2] for f in features], jnp.float32)
    pad_heights = jnp.array(pad_hs, jnp.int32)  # UNPACKED padded extents
    pad_widths = jnp.array(pad_ws, jnp.int32)
    scales = jnp.array([1.0 / s for s in strides], jnp.float32)

    # span-aware bump: the longer side must fit the window (28 cells + the
    # bilinear margin); matches the gather path when it is given the same
    # max_side_cells
    lvl = assign_boxes_to_levels(
        boxes, min_level, max_level, canonical_box_size, canonical_level,
        max_side_cells=28,
    )
    lvl_idx = (lvl - min_level).reshape(-1)  # (N,)
    flat_boxes = jnp.nan_to_num(boxes.reshape(-1, 4))  # padded slots may be junk
    n = flat_boxes.shape[0]
    bidx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), r_boxes)

    # v4 map-resident path: eligible when the largest level map + the kron
    # scratch fit comfortably in scoped VMEM (~16 MB); boxes are sorted by
    # (image, level) so each map is DMA'd once per segment, not per box.
    # The sort happens HERE, on the (N,)-sized geometry vectors, before the
    # per-box weight tensors are built — sorting those instead costs ~2.4 GB
    # of gather traffic at b128 serving shapes (measured slower than v3).
    esize = jnp.dtype(dtype).itemsize
    max_map_bytes = max(f.shape[1] * f.shape[2] for f in feats) * c_pad * esize
    m_esize = 4 if is_f32 else esize
    m_bytes = p * _ROWS * WIN_Y * WIN_X * m_esize
    # (a packed-resident v5 variant measured slower than the packed window
    # ring and was retired — docs/kernel-notebook.md)
    use_resident = (
        (ph, pw) == (_PH, _PH)
        and not quantize
        and not use_packed
        and (max_map_bytes + m_bytes) <= RESIDENT_VMEM_BUDGET
    )
    if use_resident:
        order = jnp.argsort(bidx * jnp.int32(num_levels) + lvl_idx.astype(jnp.int32), stable=True)
        inv = jnp.argsort(order)
        flat_boxes = jnp.take(flat_boxes, order, axis=0)
        lvl_idx = jnp.take(lvl_idx, order)
        bidx = jnp.take(bidx, order)

    scale = jnp.take(scales, lvl_idx)
    x1 = flat_boxes[:, 0] * scale - 0.5
    y1 = flat_boxes[:, 1] * scale - 0.5
    x2 = flat_boxes[:, 2] * scale - 0.5
    y2 = flat_boxes[:, 3] * scale - 0.5
    bin_h = (y2 - y1) / ph
    bin_w = (x2 - x1) / pw

    h_true = jnp.take(heights, lvl_idx)
    w_true = jnp.take(widths, lvl_idx)
    y0 = jnp.clip(jnp.floor(y1), 0, jnp.take(pad_heights, lvl_idx).astype(jnp.float32) - WIN_Y)
    if use_packed:
        # packed windows start on a row PAIR; footprint ≤ 30 rows + 1 drift
        # still fits the 32-row window (clip bound is even: pad_h and WIN_Y
        # are both even)
        y0 = jnp.floor(y0 / 2) * 2
    x0 = jnp.clip(jnp.floor(x1), 0, jnp.take(pad_widths, lvl_idx).astype(jnp.float32) - WIN_X)
    x0 = jnp.floor(x0 / X_ALIGN) * X_ALIGN  # provable 8-alignment for the DMA

    wy = _axis_weights(y1, bin_h, y0, h_true, ph, r, WIN_Y)  # (N, ph, WIN_Y)
    wx = _axis_weights(x1, bin_w, x0, w_true, pw, r, WIN_X)  # (N, pw, WIN_X)
    wy8 = jnp.pad(wy, ((0, 0), (0, ph_pad - ph), (0, 0)))  # pad py to the tile
    # weights ship COMPACT (8 + 7 rows per box); the 56-row kron expansion
    # happens in-kernel (_expand_rows) — the old XLA-side repeat/tile built
    # ~600 MB of expanded f32 rows per b128 batch (~10 ms of broadcast/
    # reshape/relayout in the HLO profile)

    lvl32 = lvl_idx.astype(jnp.int32)
    seg_key = bidx * num_levels + lvl32  # resident-map segment id
    y0_col = (y0 / 2 if use_packed else y0).astype(jnp.int32)  # packed-row origin
    x0_col = x0.astype(jnp.int32)
    if use_v8:
        # absorb each level's composite-buffer placement into the box's
        # window origin — the kernel then needs no level information at all
        roffs = jnp.asarray([o[0] for o in offsets], jnp.int32)
        coffs = jnp.asarray([o[1] for o in offsets], jnp.int32)
        y0_col = y0_col + jnp.take(roffs, lvl_idx)
        x0_col = x0_col + jnp.take(coffs, lvl_idx)  # coffs are X_ALIGN-aligned
    ints = jnp.stack([bidx, y0_col, x0_col, lvl32, seg_key], axis=1)  # (N, 5)

    n_pad = ((n + p - 1) // p) * p
    if n_pad != n:
        ints = jnp.pad(ints, ((0, n_pad - n), (0, 0)))
        wy8 = jnp.pad(wy8, ((0, n_pad - n), (0, 0), (0, 0)))
        wx = jnp.pad(wx, ((0, n_pad - n), (0, 0), (0, 0)))
    grid = n_pad // p

    # constant lane block-selector T[y, j] = (j // WIN_X == y)
    t_rows = _WIN_YP if use_packed else WIN_Y
    t_sel = jnp.asarray(
        (np.arange(t_rows * WIN_X)[None, :] // WIN_X) == np.arange(t_rows)[:, None],
        jnp.float32,
    )

    if use_packed:
        m_dt = jnp.float32 if is_f32 else dtype
        if use_v8:
            kernel = _kernel_factory_packed_v8(
                num_levels, c, p, dtype, map_shapes_v8, offsets, big_shape, b,
                ph_pad=ph_pad, pw=pw,
            )
            scratch = [
                pltpu.VMEM((2, big_shape[0], big_shape[1], 128), dtype),
                pltpu.SMEM((4,), jnp.int32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ]
        elif quantize:
            pitch = -(-rows // 32) * 32  # int8 sublane tile alignment
            kernel = _kernel_factory_packed_q8(
                num_levels, c, p, dtype, ph_pad=ph_pad, pw=pw
            )
            scratch = [
                pltpu.VMEM((p, _WIN_YP, WIN_X, 128), jnp.int8),
                pltpu.VMEM((p * 2 * pitch, _WIN_YP * WIN_X), jnp.int8),
                pltpu.SemaphoreType.DMA((p,)),
            ]
        else:
            kernel = _kernel_factory_packed(num_levels, c, p, dtype, ph_pad=ph_pad, pw=pw)
            scratch = [
                pltpu.VMEM((p, _WIN_YP, WIN_X, 128), dtype),
                pltpu.VMEM((p * 2 * rows, _WIN_YP * WIN_X), m_dt),
                pltpu.SemaphoreType.DMA((p,)),
            ]
        dq_specs = (
            [pl.BlockSpec(dq_tab.shape, lambda i: (0, 0))] if quantize else []
        )
        dq_args = (dq_tab,) if quantize else ()
        cparams = (
            pltpu.CompilerParams(vmem_limit_bytes=V8_VMEM_LIMIT) if use_v8 else None
        )
        out = pl.pallas_call(
            kernel,
            grid=(grid,),
            compiler_params=cparams,
            in_specs=[
                pl.BlockSpec((p, 5), lambda i: (i, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((p * ph_pad, _WIN_YP), lambda i: (i, 0)),  # wy even
                pl.BlockSpec((p * ph_pad, _WIN_YP), lambda i: (i, 0)),  # wy odd
                pl.BlockSpec((p * pw, WIN_X), lambda i: (i, 0)),  # wx (compact)
                pl.BlockSpec((_WIN_YP, _WIN_YP * WIN_X), lambda i: (0, 0)),
            ]
            + dq_specs
            + [pl.BlockSpec(memory_space=pl.ANY) for _ in range(num_levels)],
            out_specs=pl.BlockSpec((p * rows, c), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((n_pad * rows, c), dtype),
            scratch_shapes=scratch,
            interpret=interpret,
        )(
            ints,
            wy8[..., 0::2].reshape(n_pad * ph_pad, _WIN_YP),
            wy8[..., 1::2].reshape(n_pad * ph_pad, _WIN_YP),
            wx.reshape(n_pad * pw, WIN_X),
            t_sel,
            *dq_args,
            *feats,
        )
        rows_keep = ph_pad if keep_ph_pad else ph
        out = out.reshape(n_pad, ph_pad, pw, c)[:n, :rows_keep]
        if use_resident:
            out = jnp.take(out, inv, axis=0)  # undo the segment sort
        out = out.reshape(b, r_boxes, rows_keep, pw, c)
        return out[:, :r_out] if r_out != r_boxes else out

    assert (ph, pw) == (_PH, _PH), "the c>64 pooler paths are 7x7-specialised"
    if use_resident:
        kernel, (max_h, max_w) = _kernel_factory_resident(
            num_levels, c_pad, c, p, dtype, [(f.shape[1], f.shape[2]) for f in feats]
        )
        scratch = [
            pltpu.VMEM((max_h, max_w, c_pad), dtype),
            pltpu.VMEM((p * _ROWS, WIN_Y * WIN_X),
                       jnp.float32 if is_f32 else dtype),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ]
    else:
        kernel = _kernel_factory(num_levels, c_pad, c, p, dtype)
        scratch = [
            pltpu.VMEM((p, WIN_Y, WIN_X, c_pad), dtype),
            pltpu.VMEM((p * _ROWS, WIN_Y * WIN_X),
                       jnp.float32 if is_f32 else dtype),
            pltpu.SemaphoreType.DMA((p,)),
        ]
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((p, 5), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((p * 8, WIN_Y), lambda i: (i, 0)),  # wy (compact)
            pl.BlockSpec((p * _PH, WIN_X), lambda i: (i, 0)),  # wx (compact)
            pl.BlockSpec((WIN_Y, WIN_Y * WIN_X), lambda i: (0, 0)),
        ]
        + [pl.BlockSpec(memory_space=pl.ANY) for _ in range(num_levels)],
        out_specs=pl.BlockSpec((p * _ROWS, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad * _ROWS, c), dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(ints, wy8.reshape(n_pad * 8, WIN_Y), wx.reshape(n_pad * _PH, WIN_X), t_sel, *feats)
    if keep_ph_pad:
        out = out.reshape(n_pad, 8, _PH, c)[:n]
        if use_resident:
            out = jnp.take(out, inv, axis=0)  # undo the segment sort
        return out.reshape(b, r_boxes, 8, pw, c)
    out = out.reshape(n_pad, 8, _PH, c)[:n, :_PH]  # drop the py pad row
    if use_resident:
        out = jnp.take(out, inv, axis=0)  # undo the segment sort
    return out.reshape(b, r_boxes, ph, pw, c)
