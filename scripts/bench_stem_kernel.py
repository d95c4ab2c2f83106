"""Microbenchmark: fused Pallas stem vs the XLA space-to-depth stem on TPU.

Run: python scripts/bench_stem_kernel.py [batch]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main(b: int = 32, size: int = 640) -> None:
    from detax.ops.stem_pallas import fused_stem

    rng = np.random.RandomState(0)
    h2 = size // 2
    xs = jnp.asarray(rng.randn(b, h2, h2, 12), jnp.bfloat16)
    w4 = jnp.asarray(rng.randn(4, 4, 12, 64) * 0.05, jnp.float32)
    scale = jnp.ones((64,), jnp.float32)
    bias = jnp.zeros((64,), jnp.float32)

    @jax.jit
    def run_pallas(xs, w4, scale, bias):
        return jnp.sum(fused_stem(xs, w4, scale, bias).astype(jnp.float32))

    @jax.jit
    def run_xla(xs, w4, scale, bias):
        y = jax.lax.conv_general_dilated(
            xs.astype(jnp.bfloat16),
            w4.astype(jnp.bfloat16),
            window_strides=(1, 1),
            padding=[(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = jnp.maximum(y * scale + bias, 0.0).astype(jnp.bfloat16)
        y = jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "SAME"
        )
        return jnp.sum(y.astype(jnp.float32))

    for name, fn in (("pallas", run_pallas), ("xla", run_xla)):
        t0 = time.time()
        s = fn(xs, w4, scale, bias)
        np.asarray(s)
        print(f"{name} compile+first: {time.time() - t0:.1f}s")
        iters = 30
        t0 = time.time()
        for _ in range(iters):
            s = fn(xs, w4, scale, bias)
        np.asarray(s)
        print(f"{name}: {(time.time() - t0) / iters * 1000:.2f} ms/batch-{b}")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
