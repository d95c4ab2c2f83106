"""Real-texture detection evidence (VERDICT r3 item 2 fallback path).

Trains the exact-profile flagship on the photographic compositing dataset
(real photo crops pasted on real photo backgrounds — detax/train/photo.py),
evaluates mAP on held-out composites, re-prices the serving profile on the
same checkpoint, and renders a detection visualization.

Why this and not zoo weights: torchvision is not installed and the sandbox
has no network egress, so the reference's one executed weight path (torch-hub
resnet18 → remap, ``res_net.py:116-148``) cannot run here; the remap recipe
itself is ported and parity-tested against a randomized torch ResNet in
tests/test_torch_import.py.

Run: python scripts/eval_photo.py [--steps 5000] [--size 256]
Writes artifacts/photo_eval_r4.json + artifacts/photo_detections_r4.png.
"""

import argparse
import json
import os
import pickle
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/detax_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--train-images", type=int, default=256)
    ap.add_argument("--eval-images", type=int, default=64)
    ap.add_argument("--params", default="/tmp/photo_params.pkl")
    ap.add_argument("--retrain", action="store_true")
    args = ap.parse_args()

    import jax

    from detax.train.photo import PhotoCompositeDataset
    from detax.train.profiles import eval_profile, train_flagship

    train_ds = PhotoCompositeDataset(
        num_images=args.train_images, image_size=args.size, seed=0, cache=True
    )
    ncls = train_ds.num_classes
    print(f"photo composite: {ncls} classes from {len(train_ds.photos)} source photos")

    if os.path.exists(args.params) and not args.retrain:
        with open(args.params, "rb") as f:
            params = pickle.load(f)
        print(f"loaded cached params {args.params}")
    else:
        t0 = time.time()
        params, _ = train_flagship(
            args.size, ncls, args.steps, args.batch, dataset=train_ds, log_every=200
        )
        print(f"trained {args.steps} steps in {time.time() - t0:.0f}s")
        with open(args.params, "wb") as f:
            pickle.dump(jax.device_get(params), f)

    results = {"steps": args.steps, "size": args.size, "num_classes": ncls}
    for profile in ("exact", "serving_lean"):
        eval_ds = PhotoCompositeDataset(
            num_images=args.eval_images, image_size=args.size, seed=7, cache=True
        )
        m = eval_profile(
            params, args.size, ncls, profile, args.eval_images, args.batch,
            dataset=eval_ds,
        )
        results[profile] = m
        print(f"{profile:14s} mAP={m['mAP']:.4f} AP50={m['AP50']:.4f}", flush=True)

    # detection visualization on one held-out composite
    import jax.numpy as jnp

    from detax.models import FasterRCNN
    from detax.structures.image_batch import ImageBatch
    from detax.train.coco import make_batches
    from detax.train.profiles import build_frcnn_conf
    from detax.utils import draw_detections, save_image

    conf = build_frcnn_conf(args.size, ncls, "exact")
    model = FasterRCNN(conf=conf, dtype=jnp.bfloat16)
    viz_ds = PhotoCompositeDataset(num_images=4, image_size=args.size, seed=11)
    images, gt = next(
        make_batches(viz_ds, 4, conf.preprocess, max_gt_boxes=conf.max_gt_boxes, epochs=1, shuffle=False)
    )
    dets = jax.jit(lambda p, im: model.apply(p, im))(params, images)
    dets = jax.device_get(dets)
    os.makedirs("artifacts", exist_ok=True)
    panels = []
    for i in range(4):
        raw, _, _ = viz_ds.get(i)
        keep = np.asarray(dets.valid[i]) & (np.asarray(dets.scores[i]) >= 0.5)
        panels.append(
            draw_detections(
                raw,
                np.asarray(dets.boxes[i])[keep],
                classes=np.asarray(dets.classes[i])[keep],
            )
        )
    grid = np.concatenate(
        [np.concatenate(panels[:2], axis=1), np.concatenate(panels[2:], axis=1)], axis=0
    )
    save_image(grid, "artifacts/photo_detections_r4.png")
    print("wrote artifacts/photo_detections_r4.png")

    with open("artifacts/photo_eval_r4.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
