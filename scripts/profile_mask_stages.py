"""Mask branch stage ladder at serving shapes: detections -> pool -> head
-> inference select."""

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
    print(f"{name:40s} {dt:8.2f} ms", flush=True)
    return dt


def main(batch=64, size=640, dets=100):
    from detax.configs import FasterRCNNConf, PreprocessConf
    from detax.models.roi_heads import StandardROIHeads, mask_inference, pool_mask_features

    base = FasterRCNNConf(preprocess=PreprocessConf(image_size=size))
    conf = base.roi.replace(
        mask_on=True, mask_pooler=base.roi.mask_pooler.replace(impl="pallas")
    )
    strides = {"p1": 4, "p2": 8, "p3": 16, "p4": 32}
    rng = np.random.RandomState(0)
    feats = {
        k: jnp.asarray(rng.randn(batch, size // s, size // s, 64), jnp.bfloat16)
        for k, s in strides.items()
    }
    xy = rng.uniform(0, size * 0.6, (batch, dets, 2))
    wh = rng.uniform(8, size * 0.35, (batch, dets, 2))
    boxes = jnp.asarray(np.concatenate([xy, np.minimum(xy + wh, size)], -1), jnp.float32)
    classes = jnp.asarray(rng.randint(0, 80, (batch, dets)), jnp.int32)

    roi = StandardROIHeads(conf=conf, dtype=jnp.bfloat16)
    pooled0 = jnp.asarray(rng.randn(batch, dets, 14, 14, 64), jnp.bfloat16)
    params = jax.jit(roi.init, static_argnames=("method",))(
        jax.random.PRNGKey(0), pooled0, method=StandardROIHeads.mask_forward
    )

    @jax.jit
    def f_pool(feats, boxes):
        mp = pool_mask_features(conf, feats, strides, boxes)
        return jnp.sum(mp.astype(jnp.float32))

    @jax.jit
    def f_head(feats, boxes):
        mp = pool_mask_features(conf, feats, strides, boxes)
        ml = roi.apply(params, mp, train=False, method=StandardROIHeads.mask_forward)
        return jnp.sum(ml.astype(jnp.float32))

    @jax.jit
    def f_full(feats, boxes, classes):
        mp = pool_mask_features(conf, feats, strides, boxes)
        ml = roi.apply(params, mp, train=False, method=StandardROIHeads.mask_forward)
        m = mask_inference(ml, classes, conf.num_classes)
        return jnp.sum(m)

    t1 = _timed("pool (pallas 14x14)", f_pool, feats, boxes)
    t2 = _timed("+mask head", f_head, feats, boxes)
    t3 = _timed("+inference select", f_full, feats, boxes, classes)
    print(f"\n  pool {t1:.1f} | head {t2 - t1:.1f} | select {t3 - t2:.1f} | total {t3:.1f}")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
