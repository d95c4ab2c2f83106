"""Stem piece costs at b128/640²: s2d conv, maxpool variants."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

REP = 5


def _timed(name, fn, *args, iters=5, warmup=1):
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
    print(f"{name:40s} {dt:8.2f} ms", flush=True)
    return dt


def _rep(op):
    def f(*args):
        def body(acc, i):
            out = op(*((args[0] + i.astype(args[0].dtype) * 1e-6,) + args[1:]))
            return acc + jnp.sum(out.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(REP))
        return acc
    return jax.jit(f)


def pool_reduce_window(y):
    return nn.max_pool(y, window_shape=(3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


def pool_shifted(y):
    """3x3/2 maxpool via parity decomposition: out[i] = max(o[i-1], e[i], o[i])."""
    b, h, w, c = y.shape
    neg = jnp.finfo(y.dtype).min
    # H axis
    e = y[:, 0::2]          # (B, h/2, W, C) rows 2i
    o = y[:, 1::2]          # rows 2i+1
    om = jnp.concatenate([jnp.full((b, 1, w, c), neg, y.dtype), o[:, :-1]], axis=1)
    yh = jnp.maximum(jnp.maximum(e, o), om)  # (B, h/2, W, C)
    # W axis
    e = yh[:, :, 0::2]
    o = yh[:, :, 1::2]
    om = jnp.concatenate([jnp.full((b, h // 2, 1, c), neg, y.dtype), o[:, :, :-1]], axis=2)
    return jnp.maximum(jnp.maximum(e, o), om)


def main(batch=128):
    rng = np.random.RandomState(0)
    y = jnp.asarray(rng.randn(batch, 320, 320, 64), jnp.bfloat16)
    x = jnp.asarray(rng.randn(batch, 320, 320, 12), jnp.bfloat16)
    w4 = jnp.asarray(rng.randn(4, 4, 12, 64) * 0.1, jnp.bfloat16)

    conv = lambda xs: jax.lax.conv_general_dilated(
        xs, w4, (1, 1), ((2, 1), (2, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    _timed("s2d conv 4x4x12->64 @320²", _rep(conv), x)
    _timed("maxpool reduce_window 3x3/2", _rep(pool_reduce_window), y)
    _timed("maxpool shifted-parity", _rep(pool_shifted), y)

    p1 = _rep(lambda xs: pool_reduce_window(conv(xs)))
    p2 = _rep(lambda xs: pool_shifted(conv(xs)))
    _timed("conv+pool (reduce_window)", p1, x)
    _timed("conv+pool (shifted)", p2, x)

    # parity check
    a = np.asarray(pool_reduce_window(y))
    b = np.asarray(pool_shifted(y))
    print("parity max |diff|:", np.abs(a.astype(np.float32) - b.astype(np.float32)).max())


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
