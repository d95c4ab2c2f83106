"""Device-bound 640^2 train-step throughput (BASELINE config 5 evidence).

The CLI train loop's sustained rate on this dev box is host-FEED-bound (one
CPU core generates + packs the synthetic batches). This bench isolates the
chip: one fixed on-device batch, the full jitted train step (augment + fwd +
bwd + optimizer + metrics) run back-to-back.

Run: python scripts/bench_train_device.py [batch] [image_size] [steps]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main(batch=8, size=640, steps=30):
    from detax.cli import _build_model
    from detax.structures.detections import GroundTruth
    from detax.structures.image_batch import ImageBatch
    from detax.train.step import make_train_step
    from detax.train.train_state import create_train_state, make_optimizer

    model, conf = _build_model(size, 16, profile="tpu")
    rng = np.random.RandomState(0)
    pixels = jnp.asarray(rng.rand(batch, size, size, 3) * 255, jnp.float32)
    images = ImageBatch.from_pixels(pixels)
    g = conf.max_gt_boxes
    xy = rng.uniform(0, size * 0.6, (batch, g, 2))
    wh = rng.uniform(16, size * 0.3, (batch, g, 2))
    gt = GroundTruth(
        boxes=jnp.asarray(np.concatenate([xy, np.minimum(xy + wh, size)], -1), jnp.float32),
        classes=jnp.asarray(rng.randint(0, 16, (batch, g)), jnp.int32),
        valid=jnp.asarray(rng.rand(batch, g) < 0.5),
    )

    params = jax.jit(model.init)(jax.random.PRNGKey(0), images)
    tx = make_optimizer(0.01, params=params)
    state, tx = create_train_state(params, tx=tx, rng=jax.random.PRNGKey(0))
    step = make_train_step(model, tx)

    t0 = time.time()
    state, metrics = step(state, images, gt)
    np.asarray(metrics["total_loss"])
    print(f"compile+first: {time.time() - t0:.1f}s")

    for _ in range(3):
        state, metrics = step(state, images, gt)
    np.asarray(metrics["total_loss"])
    t0 = time.time()
    for _ in range(steps):
        state, metrics = step(state, images, gt)
    np.asarray(metrics["total_loss"])
    dt = (time.time() - t0) / steps
    print(
        f"device-bound train step @ {size}^2 batch {batch}: "
        f"{dt * 1000:.1f} ms/step = {batch / dt:.1f} img/s "
        f"(loss={float(np.asarray(metrics['total_loss'])):.3f})"
    )


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
