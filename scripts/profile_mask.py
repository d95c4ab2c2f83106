"""Where does Mask R-CNN inference time go? Pool vs head at serving shapes."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


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
    dt = (time.time() - t0) / iters * 1000
    print(f"{name:36s} {dt:8.2f} ms", flush=True)
    return dt


def main(batch=64, size=640, dets=100):
    from detax.configs import FasterRCNNConf, PreprocessConf
    from detax.models.roi_heads import StandardROIHeads
    from detax.ops.roi_align import multiscale_roi_align

    base = FasterRCNNConf(preprocess=PreprocessConf(image_size=size))
    conf = base.roi.replace(mask_on=True)
    strides = [4, 8, 16, 32]
    rng = np.random.RandomState(0)
    feats = [
        jnp.asarray(rng.randn(batch, size // s, size // s, 64), jnp.bfloat16)
        for s in strides
    ]
    xy = rng.uniform(0, size * 0.6, (batch, dets, 2))
    wh = rng.uniform(8, size * 0.35, (batch, dets, 2))
    boxes = jnp.asarray(np.concatenate([xy, np.minimum(xy + wh, size)], -1), jnp.float32)

    p = conf.mask_pooler

    @jax.jit
    def pool(feats, boxes):
        out = multiscale_roi_align(
            feats, boxes, strides, output_size=p.output_size,
            sampling_ratio=p.sampling_ratio, aligned=p.type == "ROIAlignV2",
            canonical_box_size=p.canonical_box_size, canonical_level=p.canonical_level,
        )
        return jnp.sum(out.astype(jnp.float32))

    print(f"mask pooler conf: out={p.output_size} r={p.sampling_ratio} type={p.type}")
    _timed(f"mask pool gather {batch}x{dets} boxes", pool, feats, boxes)

    roi = StandardROIHeads(conf=conf, dtype=jnp.bfloat16)
    pooled = jnp.asarray(rng.randn(batch, dets, 14, 14, 64), jnp.bfloat16)
    params = jax.jit(roi.init, static_argnames=("method",))(
        jax.random.PRNGKey(0), pooled, method=StandardROIHeads.mask_forward
    )

    @jax.jit
    def head(pooled):
        out = roi.apply(params, pooled, train=False, method=StandardROIHeads.mask_forward)
        return jnp.sum(out.astype(jnp.float32))

    _timed("mask head (4conv+deconv+pred)", head, pooled)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
