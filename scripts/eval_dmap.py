"""Quantify every serving-speed approximation as ΔmAP (VERDICT r2 item 4).

Trains the flagship Faster R-CNN on synthetic COCO-style data, then
evaluates ONE checkpoint under each inference profile (the exact parity
path is the oracle):

  exact        top_k + exact NMS + gather pooler (sampling_ratio 2)
  approx_topk  + jax.lax.approx_max_k at the RPN/ROI selection sites
  pallas_nms   + the Pallas NMS kernel
  pallas_pool  + the Pallas window pooler (sampling_ratio 1, level bump)
  serving      bench.py profile: all of the above + pre-NMS 1000/level,
               300 proposals/image

RetinaNet: exact flat top-k vs approx logits selection vs anchor-first.

Writes /tmp/dmap_table.json and prints a markdown table.

Run: python scripts/eval_dmap.py [--steps 300] [--size 256] [--eval 64]
"""

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def build_frcnn_conf(size, num_classes, profile):
    from detax.configs import FasterRCNNConf, PreprocessConf

    base = FasterRCNNConf(preprocess=PreprocessConf(image_size=size))
    base = base.replace(roi=base.roi.replace(num_classes=num_classes))
    if profile == "exact":
        return base
    if profile == "approx_topk":
        return base.replace(
            rpn=base.rpn.replace(topk_impl="approx"),
            roi=base.roi.replace(topk_impl="approx"),
        )
    if profile == "pallas_nms":
        return base.replace(
            rpn=base.rpn.replace(nms_impl="pallas"),
            roi=base.roi.replace(nms_impl="pallas"),
        )
    if profile == "pallas_pool":
        return base.replace(
            roi=base.roi.replace(
                box_pooler=base.roi.box_pooler.replace(sampling_ratio=1, impl="pallas")
            )
        )
    if profile == "serving":
        return base.replace(
            rpn=base.rpn.replace(
                pre_nms_topk=(2000, 1000), post_nms_topk=(2000, 300),
                nms_impl="pallas", topk_impl="approx",
            ),
            roi=base.roi.replace(
                nms_impl="pallas", topk_impl="approx",
                box_pooler=base.roi.box_pooler.replace(sampling_ratio=1, impl="pallas"),
            ),
        )
    raise ValueError(profile)


def train_flagship(size, num_classes, steps, batch, seed=0):
    from detax.models import FasterRCNN
    from detax.train.coco import SyntheticCOCO, make_batches, prefetch_batches
    from detax.train.step import make_train_step
    from detax.train.train_state import create_train_state

    conf = build_frcnn_conf(size, num_classes, "exact")
    model = FasterRCNN(conf=conf, dtype=jnp.bfloat16)
    ds = SyntheticCOCO(num_images=256, image_size=size, num_classes=num_classes, seed=seed)
    batches = prefetch_batches(
        make_batches(ds, batch, conf.preprocess, max_gt_boxes=conf.max_gt_boxes)
    )
    images0, gt0 = next(batches)
    params = jax.jit(model.init)(jax.random.PRNGKey(seed), images0)
    state, tx = create_train_state(params, rng=jax.random.PRNGKey(seed))
    step_fn = make_train_step(model, tx)
    t0 = time.time()
    for i in range(steps):
        images, gt = (images0, gt0) if i == 0 else next(batches)
        state, metrics = step_fn(state, images, gt)
        if i % 50 == 0 or i == steps - 1:
            loss = float(jax.device_get(metrics["total_loss"]))
            print(f"  step {i}: loss={loss:.3f} ({time.time()-t0:.0f}s)", flush=True)
    return jax.device_get(state.params), conf


def eval_profile(params, size, num_classes, profile, eval_images, batch, model_cls=None, seed=1):
    from detax.evaluate import DetectionEvaluator
    from detax.models import FasterRCNN
    from detax.train.coco import SyntheticCOCO, make_batches

    conf = build_frcnn_conf(size, num_classes, profile)
    model = FasterRCNN(conf=conf, dtype=jnp.bfloat16)
    fwd = jax.jit(lambda p, im: model.apply(p, im))
    ds = SyntheticCOCO(num_images=eval_images, image_size=size, num_classes=num_classes, seed=seed)
    ev = DetectionEvaluator(num_classes)
    for images, gt in make_batches(
        ds, batch, conf.preprocess, max_gt_boxes=conf.max_gt_boxes, epochs=1, seed=seed
    ):
        dets = fwd(params, images)
        ev.add_batch(jax.device_get(dets), jax.device_get(gt))
    return ev.summarize()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--eval", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--classes", type=int, default=8)
    args = ap.parse_args()

    print(f"training flagship @{args.size}px, {args.classes} classes, {args.steps} steps")
    params, _ = train_flagship(args.size, args.classes, args.steps, args.batch)

    table = {}
    for profile in ("exact", "approx_topk", "pallas_nms", "pallas_pool", "serving"):
        t0 = time.time()
        m = eval_profile(params, args.size, args.classes, profile, args.eval, args.batch)
        table[profile] = m
        print(f"{profile:12s} mAP={m['mAP']:.4f} AP50={m['AP50']:.4f} ({time.time()-t0:.0f}s)", flush=True)

    base = table["exact"]["mAP"]
    out = {
        "config": vars(args),
        "profiles": table,
        "delta_vs_exact": {k: round(v["mAP"] - base, 4) for k, v in table.items()},
    }
    with open("/tmp/dmap_table.json", "w") as f:
        json.dump(out, f, indent=2)

    print("\n| profile | mAP | ΔmAP vs exact |")
    print("|---|---|---|")
    for k, v in table.items():
        print(f"| {k} | {v['mAP']:.4f} | {v['mAP'] - base:+.4f} |")


if __name__ == "__main__":
    main()
