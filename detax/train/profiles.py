"""Inference-profile definitions + ΔmAP evaluation helpers.

The serving-speed levers (approx top-k selection, Pallas NMS, Pallas window
pooler, reduced candidate counts) are quality-affecting in principle; this
module makes each one a named *profile* of the flagship detector so a single
trained checkpoint can be scored under every profile with the COCO-exact
evaluator (``detax.evaluate``). Used by ``scripts/eval_dmap.py`` (full-size
table on TPU) and ``tests/test_dmap_regression.py`` (budget gate).

Measured on TPU (r3, 300-step synthetic 256² checkpoint, 64 eval images):
approx_topk and pallas_nms are EXACTLY quality-neutral (ΔmAP 0.0000);
the pooler's sampling_ratio=1 costs ~1.9 mAP pts while sampling_ratio=2 is
free in the Pallas kernel (weights are host-precomputed) — so the serving
profile runs r=2.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

PROFILES = (
    "exact", "approx_topk", "recall08", "pallas_nms", "pallas_pool", "pallas_pool_r2",
    "serving", "serving_r2", "serving_fast", "serving_fast_p256", "serving_fast_q8",
    "serving_fast_p192", "serving_fast_p128", "serving_lean",
)


def build_frcnn_conf(size: int, num_classes: int, profile: str, base=None):
    """Flagship Faster R-CNN conf under a named inference profile.

    ``exact`` is the parity oracle (reference defaults: lax.top_k, exact
    NMS, gather pooler, sampling_ratio 2)."""
    from detax.configs import FasterRCNNConf, PreprocessConf

    if base is None:
        base = FasterRCNNConf(preprocess=PreprocessConf(image_size=size))
    base = base.replace(roi=base.roi.replace(num_classes=num_classes))
    if profile == "exact":
        return base
    if profile == "approx_topk":
        return base.replace(
            rpn=base.rpn.replace(topk_impl="approx"),
            roi=base.roi.replace(topk_impl="approx"),
        )
    if profile == "recall08":
        # approx top-k with recall_target 0.8 (the bench serving setting;
        # ~5× cheaper PartialReduce on the 76.8k-anchor level)
        return base.replace(
            rpn=base.rpn.replace(topk_impl="approx", topk_recall=0.8),
            roi=base.roi.replace(topk_impl="approx"),
        )
    if profile == "pallas_nms":
        return base.replace(
            rpn=base.rpn.replace(nms_impl="pallas"),
            roi=base.roi.replace(nms_impl="pallas"),
        )
    if profile in ("pallas_pool", "pallas_pool_r2"):
        r = 2 if profile.endswith("r2") else 1
        return base.replace(
            roi=base.roi.replace(
                box_pooler=base.roi.box_pooler.replace(sampling_ratio=r, impl="pallas")
            )
        )
    if profile in (
        "serving", "serving_r2", "serving_fast", "serving_fast_p256", "serving_fast_q8",
        "serving_fast_p192", "serving_fast_p128", "serving_lean",
    ):
        r = 1 if profile == "serving" else 2
        # serving_fast adds the round-3 candidate-count levers: 512/level
        # pre-NMS (halves the per-level suppression blocks) and a 512
        # final-NMS candidate cap — each ~-4..5 ms at b128/640².
        # serving_fast_p256 additionally drops post-NMS proposals 300→256
        # (the ROI stage scales with the box count); p192/p128 price the
        # deeper cuts. serving_fast_q8 is p256 with the int8 pooler
        # (impl="pallas_q8") — the dmAP harness for the quantized-window
        # lever.
        fast = profile.startswith("serving_fast") or profile == "serving_lean"
        lean = profile == "serving_lean"
        # serving_lean = p192 + 384/level pre-NMS + 384 final-NMS
        # candidates: prices the next candidate-count rung below the
        # benched profile on both eval sets before the bench adopts it
        pre_k = (384 if lean else 512) if fast else 1000
        cand = (384 if lean else 512) if fast else base.roi.pre_nms_candidates
        post_k = {
            "serving_fast_p192": 192, "serving_fast_p128": 128, "serving_lean": 192,
        }.get(profile, 300 if profile in ("serving", "serving_r2", "serving_fast") else 256)
        pool_impl = "pallas_q8" if profile == "serving_fast_q8" else "pallas"
        return base.replace(
            rpn=base.rpn.replace(
                pre_nms_topk=(2000, pre_k), post_nms_topk=(2000, post_k),
                nms_impl="pallas", topk_impl="approx", topk_recall=0.8,
            ),
            roi=base.roi.replace(
                nms_impl="pallas", topk_impl="approx", pre_nms_candidates=cand,
                box_pooler=base.roi.box_pooler.replace(
                    sampling_ratio=r, impl=pool_impl
                ),
            ),
        )
    raise ValueError(f"unknown profile {profile!r}")


RETINA_PROFILES = (
    "exact", "approx", "two_stage", "anchor", "serving", "serving_f512",
    "serving_f1024", "serving_f512_k512",
)


def build_retinanet_conf(size: int, num_classes: int, profile: str, base=None):
    """RetinaNet conf under a named inference profile. ``exact`` = flat
    lax.top_k over anchors×classes + XLA NMS (the Detectron2-faithful
    path); ``anchor`` is the documented ≤1-class-per-anchor deviation;
    ``serving`` = the bench.py lever set (anchor-first + Pallas NMS)."""
    from detax.configs import FPNConf, PreprocessConf, ResNetConf, RetinaNetConf

    if base is None:
        # R18 bottom-up keeps the dmap eval affordable; the selection
        # semantics under test are backbone-independent
        base = RetinaNetConf(
            backbone=FPNConf(bottom_up=ResNetConf(), out_channels=64),
            preprocess=PreprocessConf(image_size=size),
        )
    base = base.replace(num_classes=num_classes)
    if profile == "exact":
        return base
    if profile == "approx":
        return base.replace(topk_impl="approx")
    if profile == "two_stage":
        return base.replace(topk_impl="two_stage", topk_recall=0.8)
    if profile == "anchor":
        return base.replace(topk_impl="anchor")
    if profile == "serving":
        # the benched lever set: two-stage faithful selection + Pallas NMS
        return base.replace(topk_impl="two_stage", topk_recall=0.8, nms_impl="pallas")
    if profile == "serving_f512":
        # + final-NMS candidate cap (the r4 lever: the 5-level 5000-candidate
        # argsort/gather pool measured ~19 ms/batch at b128, 0% MFU)
        return base.replace(
            topk_impl="two_stage", topk_recall=0.8, nms_impl="pallas",
            final_nms_candidates=512,
        )
    if profile == "serving_f1024":
        return base.replace(
            topk_impl="two_stage", topk_recall=0.8, nms_impl="pallas",
            final_nms_candidates=1024,
        )
    if profile == "serving_f512_k512":
        # + per-level candidates 1000 -> 512
        return base.replace(
            topk_impl="two_stage", topk_recall=0.8, nms_impl="pallas",
            final_nms_candidates=512, topk_candidates=512,
        )
    raise ValueError(f"unknown retinanet profile {profile!r}")


def train_retinanet(
    size: int,
    num_classes: int,
    steps: int,
    batch: int,
    seed: int = 0,
    base_conf=None,
    num_images: int = 256,
    log_every: int = 50,
):
    """Train the exact-profile RetinaNet on synthetic COCO-style data."""
    import time

    from detax.models import RetinaNet
    from detax.train.coco import SyntheticCOCO, make_batches, prefetch_batches
    from detax.train.step import make_train_step
    from detax.train.train_state import create_train_state

    conf = build_retinanet_conf(size, num_classes, "exact", base=base_conf)
    model = RetinaNet(conf=conf, dtype=jnp.bfloat16)
    ds = SyntheticCOCO(num_images=num_images, image_size=size, num_classes=num_classes, seed=seed)
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
        if log_every and (i % log_every == 0 or i == steps - 1):
            loss = float(jax.device_get(metrics["total_loss"]))
            print(f"  step {i}: loss={loss:.3f} ({time.time()-t0:.0f}s)", flush=True)
    return jax.device_get(state.params), conf


def eval_retina_profile(
    params,
    size: int,
    num_classes: int,
    profile: str,
    eval_images: int,
    batch: int,
    seed: int = 1,
    base_conf=None,
):
    """mAP of one RetinaNet checkpoint under one selection profile."""
    from detax.evaluate import DetectionEvaluator
    from detax.models import RetinaNet
    from detax.train.coco import SyntheticCOCO, make_batches

    conf = build_retinanet_conf(size, num_classes, profile, base=base_conf)
    model = RetinaNet(conf=conf, dtype=jnp.bfloat16)
    fwd = jax.jit(lambda p, im: model.apply(p, im))
    ds = SyntheticCOCO(num_images=eval_images, image_size=size, num_classes=num_classes, seed=seed)
    ev = DetectionEvaluator(num_classes)
    for images, gt in make_batches(
        ds, batch, conf.preprocess, max_gt_boxes=conf.max_gt_boxes, epochs=1, seed=seed
    ):
        dets = fwd(params, images)
        ev.add_batch(jax.device_get(dets), jax.device_get(gt))
    return ev.summarize()


YOLO_PROFILES = ("exact", "k512", "k256", "k128", "pallas_nms", "serving")


def build_yolo_conf(size: int, num_classes: int, profile: str, base=None):
    """YOLO conf under a named inference profile. ``exact`` = 1000
    candidates/level + XLA NMS (the parity-oracle path); ``kN`` cuts the
    per-level pre-NMS candidate count (the post-select-before-decode lever:
    the final class-aware NMS over 3×k global candidates is YOLO's largest
    remaining stage); ``serving`` = the bench.py lever set."""
    from detax.configs import PreprocessConf
    from detax.configs.yolo import YOLOConf

    if base is None:
        base = YOLOConf(preprocess=PreprocessConf(image_size=size))
    base = base.replace(num_classes=num_classes)
    if profile == "exact":
        return base
    if profile in ("k512", "k256", "k128"):
        return base.replace(topk_candidates=int(profile[1:]))
    if profile == "pallas_nms":
        return base.replace(nms_impl="pallas")
    if profile == "serving":
        return base.replace(topk_candidates=256, nms_impl="pallas")
    raise ValueError(f"unknown yolo profile {profile!r}")


def train_yolo(
    size: int,
    num_classes: int,
    steps: int,
    batch: int,
    seed: int = 0,
    base_conf=None,
    num_images: int = 256,
    log_every: int = 50,
):
    """Train the exact-profile YOLO on synthetic COCO-style data."""
    import time

    from detax.models import YOLO
    from detax.train.coco import SyntheticCOCO, make_batches, prefetch_batches
    from detax.train.step import make_train_step
    from detax.train.train_state import create_train_state

    conf = build_yolo_conf(size, num_classes, "exact", base=base_conf)
    model = YOLO(conf=conf, dtype=jnp.bfloat16)
    ds = SyntheticCOCO(num_images=num_images, image_size=size, num_classes=num_classes, seed=seed)
    batches = prefetch_batches(
        make_batches(ds, batch, conf.preprocess, max_gt_boxes=conf.max_gt_boxes)
    )
    images0, gt0 = next(batches)
    params = jax.jit(model.init)(jax.random.PRNGKey(seed), images0)
    from detax.train.train_state import warmup_cosine_schedule

    # warmup + cosine (same recipe shape as the CLI trainer): the
    # constant-0.02 run destabilised the from-scratch objectness head early
    schedule = warmup_cosine_schedule(0.02, steps, warmup_steps=min(300, steps // 10 + 1))
    state, tx = create_train_state(params, rng=jax.random.PRNGKey(seed), learning_rate=schedule)
    step_fn = make_train_step(model, tx)
    t0 = time.time()
    for i in range(steps):
        images, gt = (images0, gt0) if i == 0 else next(batches)
        state, metrics = step_fn(state, images, gt)
        if log_every and (i % log_every == 0 or i == steps - 1):
            loss = float(jax.device_get(metrics["total_loss"]))
            print(f"  step {i}: loss={loss:.3f} ({time.time()-t0:.0f}s)", flush=True)
    return jax.device_get(state.params), conf


def eval_yolo_profile(
    params,
    size: int,
    num_classes: int,
    profile: str,
    eval_images: int,
    batch: int,
    seed: int = 1,
    base_conf=None,
):
    """mAP of one YOLO checkpoint under one inference profile."""
    from detax.evaluate import DetectionEvaluator
    from detax.models import YOLO
    from detax.train.coco import SyntheticCOCO, make_batches

    conf = build_yolo_conf(size, num_classes, profile, base=base_conf)
    model = YOLO(conf=conf, dtype=jnp.bfloat16)
    fwd = jax.jit(lambda p, im: model.apply(p, im))
    ds = SyntheticCOCO(num_images=eval_images, image_size=size, num_classes=num_classes, seed=seed)
    ev = DetectionEvaluator(num_classes)
    for images, gt in make_batches(
        ds, batch, conf.preprocess, max_gt_boxes=conf.max_gt_boxes, epochs=1, seed=seed
    ):
        dets = fwd(params, images)
        ev.add_batch(jax.device_get(dets), jax.device_get(gt))
    return ev.summarize()


def train_flagship(
    size: int,
    num_classes: int,
    steps: int,
    batch: int,
    seed: int = 0,
    base_conf=None,
    num_images: int = 256,
    log_every: int = 50,
    dataset=None,
):
    """Train the exact-profile flagship on synthetic COCO-style data (or a
    caller-supplied COCO-style ``dataset``, e.g. the photographic composite
    set in detax.train.photo); returns (host params, conf)."""
    import time

    from detax.models import FasterRCNN
    from detax.train.coco import SyntheticCOCO, make_batches, prefetch_batches
    from detax.train.step import make_train_step
    from detax.train.train_state import create_train_state

    conf = build_frcnn_conf(size, num_classes, "exact", base=base_conf)
    model = FasterRCNN(conf=conf, dtype=jnp.bfloat16)
    ds = dataset if dataset is not None else SyntheticCOCO(
        num_images=num_images, image_size=size, num_classes=num_classes, seed=seed
    )
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
        if log_every and (i % log_every == 0 or i == steps - 1):
            loss = float(jax.device_get(metrics["total_loss"]))
            print(f"  step {i}: loss={loss:.3f} ({time.time()-t0:.0f}s)", flush=True)
    return jax.device_get(state.params), conf


def eval_profile(
    params,
    size: int,
    num_classes: int,
    profile: str,
    eval_images: int,
    batch: int,
    seed: int = 1,
    base_conf=None,
    max_objects: int = 8,
    dataset=None,
):
    """mAP of one checkpoint under one profile on held-out synthetic data
    (or a caller-supplied COCO-style ``dataset``).

    ``max_objects`` raises scene density — the honest stress for the
    proposal-count levers (p256/p192/p128), whose failure mode is dropping
    objects in crowded scenes."""
    from detax.evaluate import DetectionEvaluator
    from detax.models import FasterRCNN
    from detax.train.coco import SyntheticCOCO, make_batches

    conf = build_frcnn_conf(size, num_classes, profile, base=base_conf)
    model = FasterRCNN(conf=conf, dtype=jnp.bfloat16)
    fwd = jax.jit(lambda p, im: model.apply(p, im))
    ds = dataset if dataset is not None else SyntheticCOCO(
        num_images=eval_images, image_size=size, num_classes=num_classes, seed=seed,
        max_objects=max_objects,
    )
    ev = DetectionEvaluator(num_classes)
    for images, gt in make_batches(
        ds, batch, conf.preprocess, max_gt_boxes=conf.max_gt_boxes, epochs=1, seed=seed
    ):
        dets = fwd(params, images)
        ev.add_batch(jax.device_get(dets), jax.device_get(gt))
    return ev.summarize()
