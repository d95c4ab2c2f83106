"""detax command line: train / serve / detect / bench.

The reference has no CLI at all (SURVEY.md §5.6 — only dynaconf paths and
``runner.py`` hardwired to a demo script). Usage:

  python -m detax.cli train --steps 200 --batch 8 [--coco-json ... --coco-images ...]
  python -m detax.cli serve --port 8500 --batch 8
  python -m detax.cli detect image.npy --checkpoint ckpt/
  python -m detax.cli bench
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# persistent XLA compilation cache: server/train restarts with unchanged
# configs skip the multi-minute detector compiles (bench.py and the test
# conftest do the same)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/detax_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")


def _build_model(
    image_size: int, num_classes: int = 80, mask_on: bool = False,
    profile: str = "reference", family: str = "frcnn",
):
    """Build one model family under one profile.

    ``family``: frcnn (flagship Faster/Mask R-CNN) | retinanet | yolo —
    every family is trainable and servable through this one entry point.
    ``profile='tpu'`` applies that family's measured serving levers (each
    quantified as ΔmAP — scripts/eval_dmap*.py, artifacts/dmap_*_r3.json);
    ``'reference'`` is the exact parity path."""
    import jax.numpy as jnp

    from detax.configs import FasterRCNNConf, PreprocessConf, RetinaNetConf, YOLOConf
    from detax.models import FasterRCNN, RetinaNet, YOLO

    pre = PreprocessConf(image_size=image_size)
    if family == "retinanet":
        if mask_on:
            raise ValueError("--masks is a Faster R-CNN (frcnn) option")
        conf = RetinaNetConf(preprocess=pre, num_classes=num_classes)
        if profile == "tpu":
            # two-stage selection is candidate-set-faithful (ΔmAP +0.0000,
            # artifacts/dmap_retinanet_r3.json); Pallas NMS exact; final-NMS
            # pool capped at 1024 (r4 lever: kills ~16 ms/batch of 0%-MFU
            # argsort/gather plumbing; ΔmAP -0.0031 priced in
            # artifacts/dmap_retinanet_r4.json)
            conf = conf.replace(
                topk_impl="two_stage", topk_recall=0.8, nms_impl="pallas",
                final_nms_candidates=1024,
            )
        return RetinaNet(conf=conf, dtype=jnp.bfloat16), conf
    if family == "yolo":
        if mask_on:
            raise ValueError("--masks is a Faster R-CNN (frcnn) option")
        conf = YOLOConf(preprocess=pre, num_classes=num_classes)
        if profile == "tpu":
            # 256 candidates/level + Pallas NMS: ±0.000x vs the
            # 1000-candidate oracle (artifacts/dmap_yolo_r3.json)
            conf = conf.replace(topk_candidates=256, nms_impl="pallas")
        return YOLO(conf=conf, dtype=jnp.bfloat16), conf
    if family != "frcnn":
        raise ValueError(f"unknown model family {family!r}")

    conf = FasterRCNNConf(preprocess=pre)
    if num_classes != conf.roi.num_classes or mask_on:
        conf = conf.replace(roi=conf.roi.replace(num_classes=num_classes, mask_on=mask_on))
    if profile == "tpu":
        # the benched serving_lean lever set (keep in lockstep with bench.py
        # and detax/train/profiles.py): Pallas NMS + image-resident Pallas
        # ROIAlign (sampling_ratio 2), approx pre-NMS top-k with 384/level,
        # 192 test-time proposals, 384 final-NMS candidates — each lever
        # ΔmAP-priced on standard AND dense scenes (artifacts/dmap_r3*.json,
        # dmap_dense_r3.json: serving_lean is −0.0008 vs p192 dense)
        conf = conf.replace(
            rpn=conf.rpn.replace(
                pre_nms_topk=(2000, 384),
                post_nms_topk=(2000, 192),
                nms_impl="pallas",
                topk_impl="approx",
                topk_recall=0.8,
            ),
            roi=conf.roi.replace(
                nms_impl="pallas",
                topk_impl="approx",
                pre_nms_candidates=384,
                box_pooler=conf.roi.box_pooler.replace(
                    sampling_ratio=2, impl="pallas", keep_ph_pad=True
                ),
            ),
        )
    return FasterRCNN(conf=conf, dtype=jnp.bfloat16), conf


def cmd_train(args: argparse.Namespace) -> None:
    import jax
    import numpy as np

    from detax.configs.detector import PreprocessConf
    from detax.dist.mesh import create_mesh, shard_batch
    from detax.structures.image_batch import ImageBatch
    from detax.structures.logs import get_logs
    from detax.train.checkpoint import CheckpointManager
    from detax.train.coco import (
        COCOReader,
        SyntheticCOCO,
        build_device_cache,
        cached_index_batches,
        make_batches,
        make_cached_gather,
        prefetch_batches,
    )
    from detax.train.step import make_train_step
    from detax.train.train_state import create_train_state, make_optimizer, warmup_cosine_schedule

    if args.checkpoint_dir == "auto":
        # settings tier (reference dynaconf settings.toml/.env analog):
        # detax-settings.toml [default] ckp_dir, or $DETAX_CKP_DIR
        from detax import settings

        args.checkpoint_dir = settings.get("ckp_dir")
        print(f"checkpoint dir from settings: {args.checkpoint_dir}")

    model, conf = _build_model(
        args.image_size, args.num_classes, mask_on=args.masks, family=args.model,
        profile=args.profile,
    )
    if args.coco_json:
        dataset = COCOReader(args.coco_json, args.coco_images)
    else:
        dataset = SyntheticCOCO(
            num_images=args.synthetic_images, image_size=args.image_size,
            num_classes=args.num_classes, cache=True,
        )
    if args.feed == "cached":
        # device-resident dataset cache: the dataset crosses the host→device
        # wire ONCE; each step ships a batch-size index array and the batch
        # is gathered on device (see build_device_cache). Removes the
        # host-feed/transfer bound entirely for fine-tune-scale datasets.
        # masks need no cache storage or wire bytes: the jitted gather
        # rasterizes rect bitmaps on device from the cached GT boxes
        pconf = PreprocessConf(image_size=args.image_size)
        cache_images, cache_gt = build_device_cache(
            dataset, pconf, max_gt_boxes=conf.max_gt_boxes,
        )
        gather = make_cached_gather(
            mask_spec=(args.image_size, pconf.mask_stride) if args.masks else None
        )
        idx_stream = cached_index_batches(len(dataset), args.batch, seed=args.seed)

        def _cached_batches():
            while True:
                yield gather(cache_images, cache_gt, np.asarray(next(idx_stream)))

        batches = _cached_batches()
    else:
        batches = prefetch_batches(
            make_batches(
                dataset, args.batch, PreprocessConf(image_size=args.image_size),
                max_gt_boxes=conf.max_gt_boxes, rect_masks=args.masks,
                device_normalize=args.feed == "device",
            )
        )

    images, gt = next(batches)
    params = jax.jit(model.init)(jax.random.PRNGKey(args.seed), images)
    schedule = warmup_cosine_schedule(args.lr, args.steps, warmup_steps=min(500, args.steps // 10 + 1))
    tx = make_optimizer(schedule, params=params)
    state, tx = create_train_state(params, tx=tx, rng=jax.random.PRNGKey(args.seed))

    n_dev = len(jax.devices())
    mesh = create_mesh() if n_dev > 1 and args.batch % n_dev == 0 else None
    if n_dev > 1 and mesh is None:
        print(f"batch {args.batch} not divisible by {n_dev} devices: running single-device")
    step_fn = make_train_step(model, tx, mesh=mesh, augment=not args.no_augment)
    if mesh is not None:
        state = jax.device_put(state, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))

    logs = get_logs()
    ckpt = CheckpointManager(args.checkpoint_dir) if args.checkpoint_dir else None
    start_step = 0
    if args.resume:
        # preemption-safe resume (SURVEY.md §5.3/§5.4): restore the FULL
        # train state — params, optimizer state, step count, RNG — from the
        # latest checkpoint in --checkpoint-dir; the LR schedule continues
        # from the restored step because optax reads state.opt_state's count.
        # Contract analog: reference BaseModel.load 'trained' mode
        # (/root/reference/python/src/models/base.py:62-76), extended from
        # weights-only to full-state as the TPU preemption story requires.
        assert ckpt is not None, "--resume requires --checkpoint-dir"
        latest = ckpt.latest_step()
        assert latest is not None, f"--resume: no checkpoint in {args.checkpoint_dir}"
        state = ckpt.restore(state)
        start_step = int(jax.device_get(state.step))
        print(f"resumed from step {start_step} ({args.checkpoint_dir})")
        if start_step >= args.steps:
            print("nothing to do: checkpoint step >= --steps")
            return
    best = float("inf")
    t0 = time.time()
    for i in range(start_step, args.steps):
        if i > start_step:
            images, gt = next(batches)
        if mesh is not None:
            images, gt = shard_batch(mesh, images), shard_batch(mesh, gt)
        state, metrics = step_fn(state, images, gt)
        logs.put_metrics(metrics)
        logs.step()
        if (i + 1) % args.log_every == 0:
            # float() on the loss is the device sync for this window
            loss = float(metrics["total_loss"])
            now = time.time()
            rate = args.batch * args.log_every / (now - t0)  # windowed, not
            t0 = now  # cumulative — the first window absorbs the jit compile
            print(f"step {i + 1}/{args.steps} loss={loss:.4f} img/s={rate:.1f}")
            if ckpt and loss < best:
                best = loss
                ckpt.save(state, is_best=True)
        if ckpt and args.save_every and (i + 1) % args.save_every == 0:
            ckpt.save(state)
    if ckpt:
        ckpt.save(state, wait=True)
        ckpt.close()  # join orbax's async commit threads before exit
    print(f"done: final_loss={float(metrics['total_loss']):.4f}")

    if args.eval_images > 0:
        from detax.evaluate import DetectionEvaluator

        eval_ds = (
            dataset
            if args.coco_json
            else SyntheticCOCO(
                num_images=args.eval_images, image_size=args.image_size,
                num_classes=args.num_classes, seed=777,
            )
        )
        eval_batches = make_batches(
            eval_ds, args.batch, PreprocessConf(image_size=args.image_size),
            max_gt_boxes=conf.max_gt_boxes, epochs=1,
        )
        fwd = jax.jit(lambda p, im: model.apply(p, im))
        ev = DetectionEvaluator(args.num_classes)
        for images, gt in eval_batches:
            dets = fwd(state.params, images)
            ev.add_batch(dets, gt)
        print("eval:", json.dumps(ev.summarize()))


def cmd_serve(args: argparse.Namespace) -> None:
    import sys as _sys

    # 1-core host: the default 5 ms GIL switch interval thrashes between the
    # HTTP threads and the runner's Python sections under load; a longer
    # quantum keeps the batch pipeline moving (native decode/serialize
    # sections run GIL-free regardless)
    _sys.setswitchinterval(0.02)
    import jax
    import numpy as np

    from detax.serve.server import DetectionService, serve
    from detax.structures.image_batch import ImageBatch

    model, conf = _build_model(
        args.image_size, args.num_classes, profile=args.profile, family=args.model
    )
    import jax.numpy as jnp

    from detax.serve import aot

    conf_json = json.dumps(conf.to_dict(), sort_keys=True)
    init = ImageBatch.from_pixels(jnp.zeros((1, args.image_size, args.image_size, 3)))
    t0 = time.time()
    # the init program is AOT-cached like the serving buckets: a warm
    # restart skips its XLA compile too (measured 63 s of the cold start)
    init_exe, how = aot.compile_or_load(
        args.aot_cache or None, "init|" + conf_json, model.init,
        jax.random.PRNGKey(0), init,
    )
    params = init_exe(jax.random.PRNGKey(0), init)
    print(f"params init in {time.time() - t0:.1f}s ({how})", flush=True)
    service = DetectionService(
        model, params, conf.preprocess, max_batch=args.batch,
        batch_timeout_ms=args.batch_timeout_ms,
        aot_cache=args.aot_cache or None,
        conf_json=conf_json,
    )
    t0 = time.time()
    service.start()
    print(f"warmup done in {time.time() - t0:.1f}s", flush=True)
    serve(service, port=args.port)
    print(f"serving on :{args.port} (POST /detect, GET /stats)")
    try:
        while True:
            time.sleep(60)
    except KeyboardInterrupt:
        service.stop()


def cmd_detect(args: argparse.Namespace) -> None:
    import jax
    import numpy as np

    from detax.serve.server import DetectionService

    model, conf = _build_model(args.image_size, args.num_classes, family=args.model)
    import jax.numpy as jnp

    from detax.structures.image_batch import ImageBatch

    init = ImageBatch.from_pixels(jnp.zeros((1, args.image_size, args.image_size, 3)))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), init)

    if args.image.endswith(".npy"):
        img = np.load(args.image)
    else:
        from PIL import Image

        img = np.asarray(Image.open(args.image).convert("RGB"))
    service = DetectionService(model, params, conf.preprocess, max_batch=1)
    service.start()
    print(json.dumps(service.detect(img.astype(np.uint8))))
    service.stop()


def cmd_bench(args: argparse.Namespace) -> None:
    import runpy

    sys.argv = ["bench.py"]
    runpy.run_path("bench.py", run_name="__main__")


def main() -> None:
    p = argparse.ArgumentParser(prog="detax")
    sub = p.add_subparsers(dest="command", required=True)

    t = sub.add_parser("train", help="fine-tune on COCO-format or synthetic data")
    t.add_argument("--model", choices=["frcnn", "retinanet", "yolo"], default="frcnn")
    t.add_argument("--steps", type=int, default=100)
    t.add_argument("--batch", type=int, default=8)
    t.add_argument("--lr", type=float, default=0.02)
    t.add_argument("--image-size", type=int, default=640)
    t.add_argument("--num-classes", type=int, default=80)
    t.add_argument("--seed", type=int, default=0)
    t.add_argument("--coco-json", default=None)
    t.add_argument("--coco-images", default=None)
    t.add_argument("--synthetic-images", type=int, default=256)
    t.add_argument(
        "--checkpoint-dir", default=None,
        help="checkpoint directory; 'auto' resolves ckp_dir from the "
        "settings tier (detax-settings.toml / $DETAX_CKP_DIR)",
    )
    t.add_argument(
        "--resume", action="store_true",
        help="restore the latest full train state (params/opt/step/rng) from "
        "--checkpoint-dir and continue to --steps (preemption-safe resume)",
    )
    t.add_argument(
        "--save-every", type=int, default=0,
        help="save a resumable checkpoint every N steps (0 = only best/final)",
    )
    t.add_argument("--log-every", type=int, default=10)
    t.add_argument("--no-augment", action="store_true")
    t.add_argument(
        "--profile", choices=["reference", "tpu"], default="reference",
        help="'reference' trains the exact Appendix-B hyperparameters "
        "(12000 pre-NMS RPN candidates); 'tpu' trains the serving profile "
        "(2000 candidates, Pallas pooler via its custom VJP) - the fast "
        "fine-tune path, quality-priced in artifacts/dmap_*.json",
    )
    t.add_argument("--eval-images", type=int, default=0, help="run mAP eval on this many held-out images after training")
    t.add_argument("--masks", action="store_true", help="Mask R-CNN mode (instance masks; synthetic data uses exact box masks)")
    t.add_argument(
        "--feed", choices=["device", "host", "cached"], default="device",
        help="'device' ships uint8 canvases and normalizes inside the jitted "
        "step (fast feed; bit-identical for canvas-size sources); 'host' is "
        "the numpy-normalized float path; 'cached' uploads the whole dataset "
        "to the device once and assembles batches on-device (fastest — "
        "removes the host-transfer bound for fine-tune-scale datasets)",
    )
    t.set_defaults(fn=cmd_train)

    s = sub.add_parser("serve", help="batched TPU inference server")
    s.add_argument("--model", choices=["frcnn", "retinanet", "yolo"], default="frcnn")
    s.add_argument("--port", type=int, default=8500)
    s.add_argument("--batch", type=int, default=8)
    s.add_argument("--batch-timeout-ms", type=float, default=5.0)
    s.add_argument("--image-size", type=int, default=640)
    s.add_argument("--num-classes", type=int, default=80)
    s.add_argument("--profile", choices=["reference", "tpu"], default="tpu")
    s.add_argument(
        "--aot-cache", default="/tmp/detax_aot_cache",
        help="dir for serialized compiled executables (warm restarts skip "
        "the XLA compile); '' disables",
    )
    s.set_defaults(fn=cmd_serve)

    d = sub.add_parser("detect", help="run detection on one image")
    d.add_argument("--model", choices=["frcnn", "retinanet", "yolo"], default="frcnn")
    d.add_argument("image")
    d.add_argument("--image-size", type=int, default=640)
    d.add_argument("--num-classes", type=int, default=80)
    d.set_defaults(fn=cmd_detect)

    b = sub.add_parser("bench", help="run the throughput benchmark")
    b.set_defaults(fn=cmd_bench)

    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
