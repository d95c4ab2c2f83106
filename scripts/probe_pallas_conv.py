"""Probe: can a Pallas 3×3 conv beat XLA's ~55-60% MFU at detax's body shapes?

Motivation (measured, scripts/probe_int8_conv.py + profile_hlo audit): every
R18 body conv runs ~2.0-2.3 ms at b128 regardless of stage — identical FLOPs
by ResNet design — i.e. ~55-60% MFU, and int8 operands do NOT change the
time, so the bound is conv-lowering overhead, not bytes or MACs. A conv
whose taps are STATIC slices of a flat (raster, C) VMEM buffer feeding nine
accumulating (rows,128)@(128,128) matmuls has no window relayout at all:

    out_flat[f] += x_flat[f + dy*Wp + dx] @ w[dy,dx]   (padded raster)

Border garbage lands only in padding rows/cols, discarded on the final
slice. One program per image (padded 82×82×128 tile = 1.7 MB VMEM).

Run on TPU: python scripts/probe_pallas_conv.py
"""

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REP = 5


def timed(name, fn, *args, iters=10):
    s = fn(*args)
    np.asarray(s)
    s = fn(*args)
    np.asarray(s)
    t0 = time.time()
    for _ in range(iters):
        s = fn(*args)
    np.asarray(s)
    print(f"{name:46s} {(time.time()-t0)/iters/REP*1000:8.3f} ms", flush=True)


def rep(op):
    def f(*args):
        def body(acc, i):
            out = op(*((args[0] + i.astype(args[0].dtype),) + args[1:]))
            return acc + jnp.sum(out.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(REP))
        return acc
    return jax.jit(f)


def conv_xla(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _kernel(x_ref, w_ref, o_ref, acc_ref, h, wdt, c):
    hp = h + 2
    n = hp * hp
    margin = hp + 1
    first = True
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            t = (dy + 1) * 3 + (dx + 1)
            o = margin + dy * hp + dx
            part = jnp.dot(
                x_ref[0, o:o + n, :],
                w_ref[t * c:(t + 1) * c, :],
                preferred_element_type=jnp.float32,
            )
            if first:
                acc_ref[:] = part
                first = False
            else:
                acc_ref[:] += part
    out = acc_ref[:].reshape(hp, hp, c)[1:h + 1, 1:h + 1, :]
    o_ref[0] = out.astype(wdt)


def conv_pallas(x, w, h, c):
    b = x.shape[0]
    hp = h + 2
    n = hp * hp
    margin = hp + 1
    # pad to the flat raster with slack for negative tap offsets
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))).reshape(b, n, c)
    xp = jnp.pad(xp, ((0, 0), (margin, margin), (0, 0)))
    wf = w.reshape(9 * c, c)
    return pl.pallas_call(
        functools.partial(_kernel, h=h, wdt=x.dtype, c=c),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n + 2 * margin, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((9 * c, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, h, c), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, h, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((n, c), jnp.float32)],
    )(xp, wf)


def main():
    rng = np.random.RandomState(0)
    for b, h, c in ((128, 80, 128), (128, 40, 256)):
        x = jnp.asarray(rng.randn(b, h, h, c), jnp.bfloat16)
        w = jnp.asarray(rng.randn(3, 3, c, c) * 0.05, jnp.bfloat16)

        ref = np.asarray(conv_xla(x, w), np.float32)
        got = np.asarray(conv_pallas(x, w, h, c), np.float32)
        scale = np.abs(ref).max()
        print(f"shape (B{b},{h}²,{c}ch): max|Δ|/scale = {np.abs(ref-got).max()/scale:.2e}")

        timed(f"  XLA conv", rep(lambda t: conv_xla(t, w)), x)
        timed(f"  Pallas conv (incl. XLA pad pass)", rep(lambda t: conv_pallas(t, w, h, c)), x)


if __name__ == "__main__":
    main()
