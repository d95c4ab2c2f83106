"""Training-feed bench (VERDICT r3 item 3): where does the 640² train rate go?

Measures, on the real device, the sustained full train step (augment + fwd +
bwd + opt) under three feeds, plus the raw host→device transfer bound that
caps any host-side feed on this class of machine:

  host    — numpy-normalized f32 canvases shipped per step
  device  — uint8 canvases shipped per step, normalize fused into the step
  cached  — dataset resident on device, per-step host work = an index array

Writes artifacts/train_feed_r4.json.

Run: python scripts/bench_train_feed.py [batch] [image_size] [steps]
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/detax_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np


def main(batch=8, size=640, steps=30):
    import jax
    import jax.numpy as jnp

    from detax.train.coco import (
        SyntheticCOCO,
        build_device_cache,
        cached_index_batches,
        make_batches,
        make_cached_gather,
        prefetch_batches,
    )
    from detax.train.train_state import create_train_state
    from detax.train.step import make_train_step

    # same model/profile as scripts/bench_train_device.py (the tpu train
    # profile; the reference profile's 12000-candidate train-time RPN NMS
    # would swamp the feed comparison)
    from detax.cli import _build_model

    model, conf = _build_model(size, 16, profile="tpu")
    pp = conf.preprocess
    ds = SyntheticCOCO(num_images=64, image_size=size, num_classes=16, cache=True)

    # warm the dataset cache so synthesis cost doesn't pollute the host feeds
    for i in range(len(ds)):
        ds.get(i)

    results = {"batch": batch, "image_size": size, "steps": steps}

    # raw transfer bound: ship a uint8 canvas batch, touch one element
    x = np.zeros((batch, size, size, 3), np.uint8)
    put = jax.jit(lambda a: a[0, 0, 0, 0].astype(jnp.int32))
    _ = np.asarray(put(jnp.asarray(x)))
    t0 = time.time()
    for _ in range(10):
        s = put(jnp.asarray(x))
    np.asarray(s)
    dt = (time.time() - t0) / 10
    results["uint8_transfer_img_per_s"] = round(batch / dt, 1)
    results["uint8_transfer_MB_per_s"] = round(x.nbytes / dt / 1e6, 1)

    def run_feed(name, batches_fn, first_batch):
        images, gt = first_batch
        params = jax.jit(model.init)(jax.random.PRNGKey(0), images)
        state, tx = create_train_state(params, learning_rate=0.01)
        step = make_train_step(model, tx, augment=True)
        state, m = step(state, images, gt)  # compile
        float(m["total_loss"])
        batches = batches_fn()
        t0 = time.time()
        for _ in range(steps):
            images, gt = next(batches)
            state, m = step(state, images, gt)
        loss = float(m["total_loss"])  # device sync
        dt = time.time() - t0
        rate = batch * steps / dt
        results[f"{name}_img_per_s"] = round(rate, 1)
        print(f"{name:8s}: {rate:7.1f} img/s (loss {loss:.3f})", flush=True)

    # host feed (f32) and device feed (uint8)
    for name, dn in (("host", False), ("device", True)):
        mk = lambda dn=dn: prefetch_batches(
            make_batches(ds, batch, pp, max_gt_boxes=conf.max_gt_boxes, device_normalize=dn)
        )
        run_feed(name, mk, next(mk()))

    # cached feed
    cache_images, cache_gt = build_device_cache(ds, pp, max_gt_boxes=conf.max_gt_boxes)
    gather = make_cached_gather()
    idx = cached_index_batches(len(ds), batch, seed=0)

    def cached_batches():
        while True:
            yield gather(cache_images, cache_gt, np.asarray(next(idx)))

    run_feed("cached", cached_batches, next(cached_batches()))

    # Mask R-CNN rows (VERDICT r4 item 6): host-rasterized bitmaps shipped
    # per step vs device-rasterized masks inside the cached gather — the
    # latter ships NO mask bytes and should sit at the mask model's device
    # bound.
    model_m, conf_m = _build_model(size, 16, mask_on=True, profile="tpu")

    def run_feed_m(name, batches_fn, first_batch):
        images, gt = first_batch
        params = jax.jit(model_m.init)(jax.random.PRNGKey(0), images)
        state, tx = create_train_state(params, learning_rate=0.01)
        step = make_train_step(model_m, tx, augment=True)
        state, m = step(state, images, gt)
        float(m["total_loss"])
        batches = batches_fn()
        t0 = time.time()
        for _ in range(steps):
            images, gt = next(batches)
            state, m = step(state, images, gt)
        loss = float(m["total_loss"])
        dt = time.time() - t0
        rate = batch * steps / dt
        results[f"{name}_img_per_s"] = round(rate, 1)
        print(f"{name:16s}: {rate:7.1f} img/s (loss {loss:.3f})", flush=True)

    mk_host_masks = lambda: prefetch_batches(
        make_batches(
            ds, batch, pp, max_gt_boxes=conf_m.max_gt_boxes, device_normalize=True,
            rect_masks=True,
        )
    )
    run_feed_m("masks_host", mk_host_masks, next(mk_host_masks()))

    gather_m = make_cached_gather(mask_spec=(size, pp.mask_stride))
    idx_m = cached_index_batches(len(ds), batch, seed=0)

    def cached_mask_batches():
        while True:
            yield gather_m(cache_images, cache_gt, np.asarray(next(idx_m)))

    run_feed_m("masks_cached", cached_mask_batches, next(cached_mask_batches()))

    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/train_feed_r5.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
