"""Isolate individual op costs inside RPN selection at serving shapes.

Each op is repeated REP times inside one jitted scan (carry-perturbed to
defeat CSE), one dispatch per timing iter; reported = wall / (iters*REP).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

REP = 10


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
    print(f"{name:44s} {dt:8.2f} ms", flush=True)
    return dt


def _rep(op):
    """jit a scan that applies op REP times with perturbed input."""
    def f(*args):
        def body(acc, i):
            out = op(*((args[0] + i.astype(args[0].dtype) * 1e-6,) + args[1:]))
            leaves = jax.tree_util.tree_leaves(out)
            return acc + sum(jnp.sum(l.astype(jnp.float32)) for l in leaves), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(REP))
        return acc
    return jax.jit(f)


def main(batch=128):
    rng = np.random.RandomState(0)
    K = 1000
    for n in [76800, 19200, 4800]:
        lg = jnp.asarray(rng.randn(batch, n), jnp.bfloat16)
        _timed(f"approx_max_k (B,{n})->k{min(K,n)}", _rep(lambda x, n=n: jax.lax.approx_max_k(x, min(K, n))), lg)

    n = 76800
    lg = jnp.asarray(rng.randn(batch, n), jnp.bfloat16)
    _timed(f"approx_max_k (B,{n}) recall 0.8", _rep(lambda x: jax.lax.approx_max_k(x, K, recall_target=0.8)), lg)
    _timed(f"approx_max_k (B,{n}) recall 0.5", _rep(lambda x: jax.lax.approx_max_k(x, K, recall_target=0.5)), lg)
    _timed(f"approx_max_k (B,{n}) unsorted no-agg", _rep(lambda x: jax.lax.approx_max_k(x, K, aggregate_to_topk=False)), lg)

    dl = jnp.asarray(rng.randn(batch, n, 4) * 0.1, jnp.bfloat16)
    idx = jnp.asarray(np.sort(rng.randint(0, n, (batch, K)), axis=1), jnp.int32)
    _timed(f"take_along_axis (B,{n},4)->(B,{K},4)", _rep(lambda d, i: jnp.take_along_axis(d, i[..., None], axis=1), ), dl, idx)

    dlt = jnp.transpose(dl, (0, 2, 1))
    _timed(f"take_along_axis (B,4,{n})->(B,4,{K})", _rep(lambda d, i: jnp.take_along_axis(d, i[:, None, :], axis=2)), dlt, idx)

    dw = dl.reshape(batch, n // 32, 128)
    idxw = idx // 32
    _timed(f"row-gather (B,{n//32},128)->(B,{K},128)", _rep(lambda d, i: jnp.take_along_axis(d, i[..., None], axis=1)), dw, idxw)

    anch = jnp.asarray(rng.randn(n, 4), jnp.float32)
    _timed(f"take anchors ({n},4)->(B,{K},4)", _rep(lambda i: jnp.take(anch, i.astype(jnp.int32), axis=0)), idx)

    from detax.ops import box_transform
    from detax.structures import boxes as box_ops
    sd = jnp.asarray(rng.randn(batch, K, 4) * 0.1, jnp.bfloat16)
    sa = jnp.asarray(rng.rand(batch, K, 4) * 600, jnp.float32)
    sizes = jnp.full((batch, 2), 640, jnp.int32)
    def dec(d, a):
        bx = box_transform.apply_deltas(d, a, (1.0, 1.0, 1.0, 1.0), 4.135)
        return box_ops.clip(bx, sizes[:, 0:1], sizes[:, 1:2])
    _timed(f"apply_deltas+clip (B,{K},4)", _rep(dec), sd, sa)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
