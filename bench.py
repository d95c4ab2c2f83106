"""Benchmark: batched 640x640 inference throughput on the flagship detector.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = the driver north star, 5000 images/sec/chip at 640x640 on v5e
(BASELINE.md; the reference repo publishes no numbers of its own).
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/detax_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np

BASELINE_IMAGES_PER_SEC = 5000.0
BATCH = 32
SIZE = 640
WARMUP = 3
ITERS = 10


def main() -> None:
    import jax
    import jax.numpy as jnp

    from detax.configs import FasterRCNNConf, PreprocessConf
    from detax.models import FasterRCNN
    from detax.structures.image_batch import ImageBatch

    conf = FasterRCNNConf(preprocess=PreprocessConf(image_size=SIZE))
    model = FasterRCNN(conf=conf, dtype=jnp.bfloat16)

    rng = np.random.RandomState(0)
    pixels = jnp.asarray(rng.randn(BATCH, SIZE, SIZE, 3), jnp.float32)
    images = ImageBatch.from_pixels(pixels)

    init_images = ImageBatch.from_pixels(pixels[:1])
    params = jax.jit(model.init)(jax.random.PRNGKey(0), init_images)

    fwd = jax.jit(lambda p, im: model.apply(p, im))

    t0 = time.perf_counter()
    dets = fwd(params, images)
    jax.block_until_ready(dets.boxes)
    compile_s = time.perf_counter() - t0

    for _ in range(WARMUP):
        dets = fwd(params, images)
    jax.block_until_ready(dets.boxes)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        dets = fwd(params, images)
    jax.block_until_ready(dets.boxes)
    dt = time.perf_counter() - t0

    images_per_sec = BATCH * ITERS / dt
    print(
        json.dumps(
            {
                "metric": "images/sec/chip @ 640x640 batched inference (Faster R-CNN R18-FPN, bf16)",
                "value": round(images_per_sec, 2),
                "unit": "images/sec",
                "vs_baseline": round(images_per_sec / BASELINE_IMAGES_PER_SEC, 4),
            }
        )
    )
    print(
        f"# batch={BATCH} iters={ITERS} wall={dt:.3f}s compile={compile_s:.1f}s "
        f"p50_batch_latency={dt / ITERS * 1000:.2f}ms device={jax.devices()[0]}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
