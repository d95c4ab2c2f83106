"""RetinaNet int8-head lever: throughput bench + ΔmAP pricing (VERDICT-r4
item 4 / item 7).

The cls/box towers are RetinaNet's FLOP bulk (8× 3×3 256-ch convs at 97 %
MFU = ~135 of 210 ms/batch, docs/ceiling-analysis.md §RetinaNet); v5e's MXU
runs int8 at ~2× the bf16 MAC rate. Two subcommands:

--bench  (TPU, minutes): serving-profile R50 at 640²/b128, random weights —
         time the bf16 head vs the int8 head end-to-end (throughput needs
         no training).
--dmap   (TPU, ~30 min): small-harness quality pricing — bf16 baseline →
         QAT fine-tune (head.quant='qat') → calibrate act scales → export →
         int8 eval; reports mAP at each stage.

Run: python scripts/retinanet_q8.py --bench [--out artifacts/...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _bench_forward(model, params, images, iters=20, warmup=3):
    import jax

    fwd = jax.jit(lambda p, im: model.apply(p, im))
    d = fwd(params, images)
    np.asarray(d.boxes[:1, :1])  # real barrier on the remote backend
    t0 = time.perf_counter()
    for _ in range(iters):
        d = fwd(params, images)
    np.asarray(d.boxes[:1, :1])
    return (time.perf_counter() - t0) / iters


def cmd_bench(args):
    import jax
    import jax.numpy as jnp

    from detax.models import RetinaNet
    from detax.ops.quant import export_int8_tree
    from detax.structures.image_batch import ImageBatch
    from detax.train.profiles import build_retinanet_conf
    from detax.configs import PreprocessConf, RetinaNetConf

    base = RetinaNetConf(preprocess=PreprocessConf(image_size=args.image_size))
    conf = build_retinanet_conf(args.image_size, args.num_classes, args.profile, base=base)
    rng = jax.random.PRNGKey(0)
    pixels = jnp.asarray(
        np.random.RandomState(0).rand(args.batch, args.image_size, args.image_size, 3) * 255,
        jnp.float32,
    )
    images = ImageBatch.from_pixels(pixels)

    model_bf = RetinaNet(conf=conf, dtype=jnp.bfloat16)
    params = jax.jit(model_bf.init)(rng, ImageBatch.from_pixels(pixels[:1]))
    t_bf = _bench_forward(model_bf, params, images, iters=args.iters)
    print(f"bf16:  {1e3*t_bf:.1f} ms/batch = {args.batch/t_bf:.1f} img/s", flush=True)

    # QAT-mode apply on the SAME params captures per-conv act scales; export
    conf_q = conf.replace(head=conf.head.replace(quant="qat"))
    model_q = RetinaNet(conf=conf_q, dtype=jnp.bfloat16)
    small = ImageBatch.from_pixels(pixels[:1])
    _, state = jax.jit(
        lambda p, im: model_q.apply(p, im, mutable=["intermediates"])
    )(params, small)
    inter = jax.device_get(state["intermediates"])
    p_i8 = dict(jax.device_get(params))
    p_i8["params"] = export_int8_tree(
        jax.device_get(params)["params"], inter.get("params", inter)
    )
    conf_i8 = conf.replace(head=conf.head.replace(quant="int8"))
    model_i8 = RetinaNet(conf=conf_i8, dtype=jnp.bfloat16)
    t_i8 = _bench_forward(model_i8, p_i8, images, iters=args.iters)
    print(f"int8:  {1e3*t_i8:.1f} ms/batch = {args.batch/t_i8:.1f} img/s", flush=True)

    out = {
        "profile": args.profile,
        "batch": args.batch,
        "image_size": args.image_size,
        "bf16_ms": round(1e3 * t_bf, 1),
        "int8_ms": round(1e3 * t_i8, 1),
        "bf16_img_s": round(args.batch / t_bf, 1),
        "int8_img_s": round(args.batch / t_i8, 1),
        "speedup": round(t_bf / t_i8, 3),
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


def cmd_dmap(args):
    import pickle

    import jax
    import jax.numpy as jnp

    from detax.models import RetinaNet
    from detax.ops.quant import export_int8_tree
    from detax.train.coco import SyntheticCOCO, make_batches, prefetch_batches
    from detax.train.profiles import build_retinanet_conf, eval_retina_profile, train_retinanet
    from detax.train.step import make_train_step
    from detax.train.train_state import create_train_state

    # 1. bf16 baseline (cached like the other dmap harnesses)
    if os.path.exists(args.params) and not args.retrain:
        with open(args.params, "rb") as f:
            params = pickle.load(f)
        conf = build_retinanet_conf(args.size, args.classes, "exact")
    else:
        params, conf = train_retinanet(args.size, args.classes, args.steps, args.batch)
        with open(args.params, "wb") as f:
            pickle.dump(jax.device_get(params), f)
    m_bf = eval_retina_profile(params, args.size, args.classes, "exact", args.eval, args.batch)
    print(f"bf16 baseline: mAP={m_bf['mAP']:.4f}", flush=True)

    # 2. QAT fine-tune from the bf16 checkpoint (same param structure)
    conf_q = conf.replace(head=conf.head.replace(quant="qat"))
    model_q = RetinaNet(conf=conf_q, dtype=jnp.bfloat16)
    ds = SyntheticCOCO(
        num_images=256, image_size=args.size, num_classes=args.classes, seed=0
    )
    batches = prefetch_batches(
        make_batches(ds, args.batch, conf.preprocess, max_gt_boxes=conf.max_gt_boxes)
    )
    state, tx = create_train_state(params, rng=jax.random.PRNGKey(0), learning_rate=2e-3)
    step_fn = make_train_step(model_q, tx)
    t0 = time.time()
    for i in range(args.qat_steps):
        images, gt = next(batches)
        state, metrics = step_fn(state, images, gt)
        if i % 50 == 0 or i == args.qat_steps - 1:
            loss = float(jax.device_get(metrics["total_loss"]))
            print(f"  qat step {i}: loss={loss:.3f} ({time.time()-t0:.0f}s)", flush=True)
    qat_params = jax.device_get(state.params)
    m_qat = eval_retina_profile(
        qat_params, args.size, args.classes, "exact", args.eval, args.batch,
        base_conf=build_retinanet_conf(args.size, args.classes, "exact").replace(
            head=conf.head.replace(quant="qat")
        ),
    )
    print(f"qat (fake-quant eval): mAP={m_qat['mAP']:.4f}", flush=True)

    # 3. calibrate act scales over eval-distribution batches, export int8
    calib = SyntheticCOCO(
        num_images=args.batch * 4, image_size=args.size, num_classes=args.classes, seed=2
    )
    apply_q = jax.jit(lambda p, im: model_q.apply(p, im, mutable=["intermediates"]))
    inters = []
    for images, _ in make_batches(
        calib, args.batch, conf.preprocess, max_gt_boxes=conf.max_gt_boxes, epochs=1, seed=2
    ):
        _, st = apply_q(qat_params, images)
        inters.append(jax.device_get(st["intermediates"]))

    def merge(trees):
        """Concatenate sown tuples across batches (max happens in export)."""
        out = trees[0]
        for t in trees[1:]:
            out = jax.tree_util.tree_map(
                lambda a, b: a + b, out, t,
                is_leaf=lambda x: isinstance(x, tuple),
            )
        return out

    inter = merge(inters)
    p_i8 = dict(qat_params)
    p_i8["params"] = export_int8_tree(
        qat_params["params"], inter.get("params", inter)
    )
    m_i8 = eval_retina_profile(
        p_i8, args.size, args.classes, "exact", args.eval, args.batch,
        base_conf=build_retinanet_conf(args.size, args.classes, "exact").replace(
            head=conf.head.replace(quant="int8")
        ),
    )
    print(f"int8 (real int8 convs): mAP={m_i8['mAP']:.4f}", flush=True)

    out = {
        "config": {k: v for k, v in vars(args).items() if k not in ("retrain", "cmd")},
        "bf16": m_bf,
        "qat": m_qat,
        "int8": m_i8,
        "delta_int8_vs_bf16": round(m_i8["mAP"] - m_bf["mAP"], 4),
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out["delta_int8_vs_bf16"]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench", action="store_true")
    ap.add_argument("--dmap", action="store_true")
    ap.add_argument("--image-size", type=int, default=640)
    ap.add_argument("--num-classes", type=int, default=80)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--bench-batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--profile", default="serving_f1024")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--classes", type=int, default=8)
    ap.add_argument("--eval", type=int, default=64)
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--qat-steps", type=int, default=200)
    ap.add_argument("--params", default="/tmp/dmap_retina_params.pkl")
    ap.add_argument("--retrain", action="store_true")
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    if args.bench:
        args.batch = args.bench_batch
        cmd_bench(args)
    if args.dmap:
        cmd_dmap(args)


if __name__ == "__main__":
    main()
