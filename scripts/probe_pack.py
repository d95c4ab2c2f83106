"""Probe: y-pair pack pass formulations for the v8 pooler.

The v8 image-resident ROI kernel consumes per-level feature maps packed as
(B, H/2, W, 128) with lane = parity*64 + channel. The XLA-side pack
(reshape/transpose/reshape in multiscale_roi_align_pallas) measured ~2.5 ms
at serving shapes vs a ~1.4 ms HBM floor (0.57 GB r + 0.57 GB w). Candidates:

  a) shipping reshape(b,h/2,2,w,64) -> transpose -> reshape
  b) strided-slice + concat: concatenate([f[:,0::2], f[:,1::2]], axis=-1)
  c) Pallas per-image pack kernel (VMEM shuffle, one grid step per image)

Run: PYTHONPATH=. python scripts/probe_pack.py [batch]
"""

import sys
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

REP = 5


def _timed(name, fn, *args, iters=10, warmup=2):
    s = fn(*args)
    np.asarray(s)
    for _ in range(warmup):
        s = fn(*args)
    np.asarray(s)
    t0 = time.time()
    for _ in range(iters):
        s = fn(*args)
    np.asarray(s)
    dt = (time.time() - t0) / iters / REP * 1000
    print(f"{name:34s} {dt:8.2f} ms/batch", flush=True)
    return dt


def _rep(op):
    """Run op REP times inside one jit (amortizes dispatch), reduce to scalar."""
    def f(*args):
        def body(acc, i):
            outs = op(*((args[0] + i.astype(args[0].dtype) * 1e-6,) + args[1:]))
            return acc + sum(jnp.sum(o.astype(jnp.float32)) for o in outs), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(REP))
        return acc
    return jax.jit(f)


def pack_a(f):
    b, h, w, c = f.shape
    return (f.reshape(b, h // 2, 2, w, c)
            .transpose(0, 1, 3, 2, 4)
            .reshape(b, h // 2, w, 2 * c))


def pack_b(f):
    return jnp.concatenate([f[:, 0::2], f[:, 1::2]], axis=-1)


def _pack_kernel(in_ref, out_ref):
    _, h, w, c = in_ref.shape
    x = in_ref[0].reshape(h // 2, 2, w, c)
    out_ref[0] = jnp.concatenate([x[:, 0], x[:, 1]], axis=-1)


STRIP = 4  # packed rows per program (divides every level's H/2)


@functools.partial(jax.jit, static_argnames=())
def pack_c(f):
    b, h, w, c = f.shape
    s = min(STRIP, h // 2)
    return pl.pallas_call(
        _pack_kernel,
        grid=(b, (h // 2) // s),
        in_specs=[pl.BlockSpec((1, 2 * s, w, c), lambda i, j: (i, j, 0, 0))],
        out_specs=pl.BlockSpec((1, s, w, 2 * c), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h // 2, w, 2 * c), f.dtype),
    )(f)


def main(batch=128):
    rng = np.random.RandomState(0)
    # serving-shape levels (already padded as the wrapper pads them)
    shapes = [(160, 160), (80, 80), (40, 40), (32, 40)]
    feats = [jnp.asarray(rng.randn(batch, h, w, 64), jnp.bfloat16) for h, w in shapes]

    def all_levels(pack):
        def op(f0, *rest):
            return tuple(pack(f) for f in (f0,) + rest)
        return op

    # parity first
    for name, fn in (("b", pack_b), ("c", pack_c)):
        got = np.asarray(fn(feats[0][:2]))
        ref = np.asarray(pack_a(feats[0][:2]))
        assert (got == ref).all(), f"pack_{name} mismatch"
    print("parity ok", flush=True)

    _timed("a) reshape/transpose (shipping)", _rep(all_levels(pack_a)), *feats)
    _timed("b) strided slice + concat", _rep(all_levels(pack_b)), *feats)
    _timed("c) pallas pack kernel", _rep(all_levels(pack_c)), *feats)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
