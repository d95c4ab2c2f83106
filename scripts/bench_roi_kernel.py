"""Microbenchmark: Pallas ROIAlign kernel at serving shapes on real TPU.

Run: python scripts/bench_roi_kernel.py [n_boxes]

Remote-backend discipline (see .claude/skills/verify): block_until_ready is a
no-op over the tunnel, so the timed program reduces to a scalar INSIDE the
jit and sync is a tiny host fetch.
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main(n_boxes: int = 38400, size: int = 640, c: int = 128) -> None:
    from detax.ops.roi_align_pallas import multiscale_roi_align_pallas

    strides = [4, 8, 16, 32]
    b = 128
    rng = np.random.RandomState(0)
    feats = [
        jnp.asarray(rng.randn(b, size // s, size // s, c), jnp.bfloat16)
        for s in strides
    ]
    r = n_boxes // b
    xy = rng.uniform(0, size * 0.6, (b, r, 2))
    wh = rng.uniform(8, size * 0.35, (b, r, 2))
    boxes = jnp.asarray(
        np.concatenate([xy, np.minimum(xy + wh, size)], -1), jnp.float32
    )

    @jax.jit
    def run(feats, boxes):
        out = multiscale_roi_align_pallas(feats, boxes, strides, (7, 7), 2)
        return jnp.sum(out.astype(jnp.float32))

    t0 = time.time()
    s = run(feats, boxes)
    np.asarray(s)  # sync
    print(f"compile+first: {time.time() - t0:.1f}s")
    iters = 20
    t0 = time.time()
    for _ in range(iters):
        s = run(feats, boxes)
    np.asarray(s)
    dt = (time.time() - t0) / iters * 1000
    cyc = dt * 1e-3 * 940e6 / n_boxes
    print(f"{n_boxes} boxes: {dt:.2f} ms/call  ({cyc:.0f} cy/box @940MHz)")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
