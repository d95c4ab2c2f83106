"""Phase-cost probe for the packed ROI kernel at serving shapes.

Builds variant kernels with phases disabled: dma (issue+wait only),
mbuild (weights expansion only), matmul (compute on stale VMEM, no DMA),
full. Run: python scripts/probe_roi_phases.py
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import detax.ops.roi_align_pallas as rap
from detax.ops.roi_align_pallas import (
    WIN_X, X_ALIGN, _PH, _ROWS, _WIN_YP, _expand_rows,
)


def _factory_probe(num_levels, c_out, p, out_dtype, phase):
    def kernel(ints_ref, wye_ref, wyo_ref, wx_ref, t_ref, *refs):
        feat_refs = refs[:num_levels]
        out_ref = refs[num_levels]
        window = refs[num_levels + 1]
        me_scr = refs[num_levels + 2]
        mo_scr = refs[num_levels + 3]
        sems = refs[num_levels + 4]

        do_dma = phase in ("dma", "full", "dma+matmul")
        do_m = phase in ("mbuild", "mchunk", "full", "mbuild+matmul")
        do_mm = phase in ("matmul", "full", "dma+matmul", "mbuild+matmul")

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
                        window.at[j], sems.at[j],
                    ).start()

        def wait_dma(j):
            pltpu.make_async_copy(
                feat_refs[0].at[0, pl.ds(0, _WIN_YP), pl.ds(0, WIN_X), :],
                window.at[j], sems.at[j],
            ).wait()

        if do_dma:
            for j in range(p):
                start_dma(j)

        precision = jax.lax.Precision.DEFAULT
        mm_dtype = out_dtype

        if do_m:
            (wye56, wyo56), wx56 = _expand_rows(
                p, [wye_ref[:].astype(mm_dtype), wyo_ref[:].astype(mm_dtype)],
                wx_ref[:].astype(mm_dtype), precision)

            if phase.startswith("mchunk"):
                chunk = max(1, p // 4) * _ROWS
                for q in range(0, p * _ROWS, chunk):
                    a1 = pltpu.repeat(wx56[q:q + chunk, :], _WIN_YP, axis=1)
                    for wexp, scr in ((wye56, me_scr), (wyo56, mo_scr)):
                        a2 = jnp.dot(wexp[q:q + chunk, :], t_ref[:].astype(mm_dtype),
                                     preferred_element_type=jnp.float32, precision=precision)
                        scr[q:q + chunk, :] = a1 * a2.astype(mm_dtype)
            else:
                def build_m(j):
                    q = j * _ROWS
                    a1 = pltpu.repeat(wx56[q:q + _ROWS, :], _WIN_YP, axis=1)
                    for wexp, scr in ((wye56, me_scr), (wyo56, mo_scr)):
                        a2 = jnp.dot(wexp[q:q + _ROWS, :], t_ref[:].astype(mm_dtype),
                                     preferred_element_type=jnp.float32, precision=precision)
                        scr[q:q + _ROWS, :] = a1 * a2.astype(mm_dtype)
                for j in range(p):
                    build_m(j)

        for j in range(p):
            if do_dma:
                wait_dma(j)
            if do_mm:
                win = window[j].reshape(_WIN_YP * WIN_X, 128)
                m2 = jnp.concatenate(
                    [me_scr[j * _ROWS:(j + 1) * _ROWS, :],
                     mo_scr[j * _ROWS:(j + 1) * _ROWS, :]], axis=0
                ).astype(win.dtype)
                o2 = jnp.dot(m2, win, preferred_element_type=jnp.float32,
                             precision=precision)
                o = o2[:_ROWS] + pltpu.roll(o2[_ROWS:], 64, axis=1)
                out_ref[pl.ds(j * _ROWS, _ROWS), :] = o[:, :c_out].astype(out_dtype)
            elif not do_mm:
                out_ref[pl.ds(j * _ROWS, _ROWS), :] = jnp.zeros((_ROWS, c_out), out_dtype)

    return kernel


def run_phase(phase, feats_p, ints, wye, wyo, wx, t_sel, *, n_pad, p, c, num_levels, dtype):
    kernel = _factory_probe(num_levels, c, p, dtype, phase)
    grid = n_pad // p
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((p, 5), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((p * 8, _WIN_YP), lambda i: (i, 0)),
            pl.BlockSpec((p * 8, _WIN_YP), lambda i: (i, 0)),
            pl.BlockSpec((p * _PH, WIN_X), lambda i: (i, 0)),
            pl.BlockSpec((_WIN_YP, _WIN_YP * WIN_X), lambda i: (0, 0)),
        ] + [pl.BlockSpec(memory_space=pltpu.ANY) for _ in range(num_levels)],
        out_specs=pl.BlockSpec((p * _ROWS, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad * _ROWS, c), dtype),
        scratch_shapes=[
            pltpu.VMEM((p, _WIN_YP, WIN_X, 128), dtype),
            pltpu.VMEM((p * _ROWS, _WIN_YP * WIN_X), dtype),
            pltpu.VMEM((p * _ROWS, _WIN_YP * WIN_X), dtype),
            pltpu.SemaphoreType.DMA((p,)),
        ],
    )(ints, wye, wyo, wx, t_sel, *feats_p)
    return jnp.sum(out.astype(jnp.float32))


def main(n_boxes=38400, size=640):
    strides = [4, 8, 16, 32]
    b, c = 128, 64
    p = rap.BOXES_PER_PROGRAM
    rng = np.random.RandomState(0)
    feats = [jnp.asarray(rng.randn(b, size // s, size // s, c), jnp.bfloat16) for s in strides]
    r = n_boxes // b
    xy = rng.uniform(0, size * 0.6, (b, r, 2))
    wh = rng.uniform(8, size * 0.35, (b, r, 2))
    boxes = jnp.asarray(np.concatenate([xy, np.minimum(xy + wh, size)], -1), jnp.float32)

    # reuse the wrapper's preprocessing by tracing it once on CPU-side numpy:
    # easier: call the wrapper internals via a trimmed copy
    from detax.ops.roi_align import assign_boxes_to_levels
    dtype = feats[0].dtype
    num_levels = len(feats)
    feats_p, pad_hs, pad_ws = [], [], []
    for f in feats:
        hp = max(rap.WIN_Y, f.shape[1] + (f.shape[1] & 1))
        wp = max(WIN_X, -(-f.shape[2] // X_ALIGN) * X_ALIGN)
        if (hp, wp, 64) != f.shape[1:]:
            f = jnp.pad(f, ((0, 0), (0, hp - f.shape[1]), (0, wp - f.shape[2]), (0, 0)))
        f = f.reshape(b, hp // 2, 2, wp, 64).transpose(0, 1, 3, 2, 4).reshape(b, hp // 2, wp, 128)
        pad_hs.append(hp); pad_ws.append(wp)
        feats_p.append(f)
    heights = jnp.array([f.shape[1] for f in feats], jnp.float32)
    widths = jnp.array([f.shape[2] for f in feats], jnp.float32)
    pad_heights = jnp.array(pad_hs, jnp.int32)
    pad_widths = jnp.array(pad_ws, jnp.int32)
    scales = jnp.array([1.0 / s for s in strides], jnp.float32)

    lvl = assign_boxes_to_levels(boxes, 2, 5, 224, 4, max_side_cells=28)
    lvl_idx = (lvl - 2).reshape(-1)
    flat = boxes.reshape(-1, 4)
    n = flat.shape[0]
    bidx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), r)
    scale = jnp.take(scales, lvl_idx)
    x1 = flat[:, 0] * scale - 0.5
    y1 = flat[:, 1] * scale - 0.5
    x2 = flat[:, 2] * scale - 0.5
    y2 = flat[:, 3] * scale - 0.5
    bin_h = (y2 - y1) / _PH
    bin_w = (x2 - x1) / _PH
    h_true = jnp.take(heights, lvl_idx)
    w_true = jnp.take(widths, lvl_idx)
    y0 = jnp.clip(jnp.floor(y1), 0, jnp.take(pad_heights, lvl_idx).astype(jnp.float32) - rap.WIN_Y)
    y0 = jnp.floor(y0 / 2) * 2
    x0 = jnp.clip(jnp.floor(x1), 0, jnp.take(pad_widths, lvl_idx).astype(jnp.float32) - WIN_X)
    x0 = jnp.floor(x0 / X_ALIGN) * X_ALIGN
    wy = rap._axis_weights(y1, bin_h, y0, h_true, _PH, 2, rap.WIN_Y)
    wx = rap._axis_weights(x1, bin_w, x0, w_true, _PH, 2, WIN_X)
    wy8 = jnp.pad(wy, ((0, 0), (0, 1), (0, 0)))
    lvl32 = lvl_idx.astype(jnp.int32)
    ints = jnp.stack([bidx, (y0 / 2).astype(jnp.int32), x0.astype(jnp.int32), lvl32,
                      bidx * num_levels + lvl32], axis=1)
    n_pad = ((n + p - 1) // p) * p
    if n_pad != n:
        ints = jnp.pad(ints, ((0, n_pad - n), (0, 0)))
        wy8 = jnp.pad(wy8, ((0, n_pad - n), (0, 0), (0, 0)))
        wx = jnp.pad(wx, ((0, n_pad - n), (0, 0), (0, 0)))
    t_sel = jnp.asarray((np.arange(_WIN_YP * WIN_X)[None, :] // WIN_X) == np.arange(_WIN_YP)[:, None], jnp.float32)
    wye = wy8[..., 0::2].reshape(n_pad * 8, _WIN_YP)
    wyo = wy8[..., 1::2].reshape(n_pad * 8, _WIN_YP)
    wxr = wx.reshape(n_pad * _PH, WIN_X)

    args = (feats_p, ints, wye, wyo, wxr, t_sel)
    kw = dict(n_pad=n_pad, p=p, c=c, num_levels=num_levels, dtype=jnp.bfloat16)
    for phase in ("dma", "mbuild", "matmul", "mbuild+matmul", "full"):
        f = jax.jit(
            functools.partial(run_phase, phase),
            static_argnames=("n_pad", "p", "c", "num_levels", "dtype"),
        )
        s = f(*args, **kw); np.asarray(s)
        s = f(*args, **kw); np.asarray(s)
        t0 = time.time()
        for _ in range(10):
            s = f(*args, **kw)
        np.asarray(s)
        dt = (time.time() - t0) / 10 * 1000
        print(f"{phase:16s} {dt:7.2f} ms", flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
