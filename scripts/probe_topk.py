"""Probe: RPN per-level top-k formulations at serving shapes.

The select stage's approx_max_k (k=384/level, recall 0.8-0.95) measures
~2.3-2.8 ms/batch over the 5 FPN levels — far above the ~0.9 ms floor the
ceiling doc ascribes to the PartialReduce itself. Hypothesis: the cost is the
exact aggregation top_k over the PartialReduce output, not the reduce.

Candidates (per level, scores (B, N) bf16):
  a) approx_max_k(k, recall=0.8)                 [shipping serving config]
  b) approx_max_k(k, recall=0.95)                [jax default]
  c) approx_max_k(k, aggregate_to_topk=False) -> raw (B, l) winners,
     then exact top_k(l -> k) — same result, shows the split
  d) bucket-max: reshape (B, nb, bs), per-bucket max+argmax (pure VPU),
     then exact top_k over nb bucket winners. nb = 2k buckets.
     SEMANTIC CHANGE (recall analog: one winner per bs-anchor bucket) —
     a priceable lever like topk_recall, NOT exact.
  e) d) with nb = k buckets and a final full sort of the k winners
     (sort_key trick) — the minimal-sort variant.

Run: PYTHONPATH=. python scripts/probe_topk.py [batch] [k]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

LEVELS = [76800, 19200, 4800, 1200, 300]

# NOTE: all numbers include the remote backend's ~1.3 ms dispatch constant
# (the scan-REP amortization trick CSE-hoists selection ops — measured 0.01ms
# for ANY variant — so this probe times direct jit calls; variant-vs-variant
# comparisons and a dispatch-only baseline are what matter).


def _timed(name, fn, *args, iters=30, warmup=3):
    s = fn(*args)
    np.asarray(s)
    for _ in range(warmup):
        s = fn(*args)
    np.asarray(s)
    t0 = time.time()
    for _ in range(iters):
        s = fn(*args)
    np.asarray(s)
    dt = (time.time() - t0) / iters * 1000
    print(f"{name:44s} {dt:8.2f} ms/batch (incl dispatch)", flush=True)
    return dt


def _rep(op):
    return jax.jit(op)


def _reduce(sc, idx):
    return jnp.sum(sc.astype(jnp.float32)) + jnp.sum(idx).astype(jnp.float32)


def make_a(k, recall):
    def op(*logits):
        acc = jnp.float32(0)
        for lg in logits:
            kk = min(k, lg.shape[-1])
            if kk < lg.shape[-1]:
                sc, idx = jax.lax.approx_max_k(lg, kk, recall_target=recall)
            else:
                sc, idx = jax.lax.top_k(lg, kk)
            acc += _reduce(sc, idx)
        return acc
    return op


def make_c(k, recall):
    def op(*logits):
        acc = jnp.float32(0)
        for lg in logits:
            kk = min(k, lg.shape[-1])
            if kk < lg.shape[-1]:
                sc, idx = jax.lax.approx_max_k(
                    lg, kk, recall_target=recall, aggregate_to_topk=False)
                sc2, j = jax.lax.top_k(sc, kk)
                idx = jnp.take_along_axis(idx, j, axis=1)
                acc += _reduce(sc2, idx)
            else:
                sc, idx = jax.lax.top_k(lg, kk)
                acc += _reduce(sc, idx)
        return acc
    return op


def make_c_raw(k, recall):
    """Just the PartialReduce, no aggregation — the floor of a/c."""
    def op(*logits):
        acc = jnp.float32(0)
        for lg in logits:
            kk = min(k, lg.shape[-1])
            if kk < lg.shape[-1]:
                sc, idx = jax.lax.approx_max_k(
                    lg, kk, recall_target=recall, aggregate_to_topk=False)
                acc += _reduce(sc, idx)
            else:
                sc, idx = jax.lax.top_k(lg, kk)
                acc += _reduce(sc, idx)
        return acc
    return op


def _bucket_max(lg, nb):
    b, n = lg.shape
    bs = -(-n // nb)
    pad = nb * bs - n
    if pad:
        lg = jnp.pad(lg, ((0, 0), (0, pad)), constant_values=-np.inf)
    x = lg.reshape(b, nb, bs)
    sc = jnp.max(x, axis=-1)
    am = jnp.argmax(x, axis=-1).astype(jnp.int32)
    idx = am + (jnp.arange(nb, dtype=jnp.int32) * bs)[None, :]
    return sc, idx


def make_d(k, factor):
    def op(*logits):
        acc = jnp.float32(0)
        for lg in logits:
            kk = min(k, lg.shape[-1])
            if kk < lg.shape[-1] and factor * kk < lg.shape[-1]:
                sc, idx = _bucket_max(lg, factor * kk)
                sc2, j = jax.lax.top_k(sc, kk)
                idx = jnp.take_along_axis(idx, j, axis=1)
                acc += _reduce(sc2, idx)
            else:
                sc, idx = jax.lax.top_k(lg, kk)
                acc += _reduce(sc, idx)
        return acc
    return op


def make_e(k):
    def op(*logits):
        acc = jnp.float32(0)
        for lg in logits:
            kk = min(k, lg.shape[-1])
            if kk < lg.shape[-1]:
                sc, idx = _bucket_max(lg, kk)
                # full descending sort of the k winners, carry indices
                o = jnp.argsort(-sc, axis=-1)
                sc = jnp.take_along_axis(sc, o, axis=1)
                idx = jnp.take_along_axis(idx, o, axis=1)
                acc += _reduce(sc, idx)
            else:
                sc, idx = jax.lax.top_k(lg, kk)
                acc += _reduce(sc, idx)
        return acc
    return op


def main(batch=128, k=384):
    rng = np.random.RandomState(0)
    logits = [jnp.asarray(rng.randn(batch, n), jnp.bfloat16) for n in LEVELS]

    _timed("0) dispatch-only (sum of level sums)", _rep(
        lambda *ls: sum(jnp.sum(l.astype(jnp.float32)) for l in ls)), *logits)
    _timed("a) approx_max_k recall 0.8", _rep(make_a(k, 0.8)), *logits)
    _timed("b) approx_max_k recall 0.95", _rep(make_a(k, 0.95)), *logits)
    _timed("c-raw) PartialReduce only (no agg)", _rep(make_c_raw(k, 0.8)), *logits)
    _timed("c) PartialReduce + explicit top_k", _rep(make_c(k, 0.8)), *logits)
    _timed("d) bucket-max 2k + top_k", _rep(make_d(k, 2)), *logits)
    _timed("e) bucket-max k + argsort(k)", _rep(make_e(k)), *logits)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
