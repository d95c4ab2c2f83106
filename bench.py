"""Benchmark: batched 640x640 inference throughput on the flagship detector.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = the driver north star, 5000 images/sec/chip at 640x640 on v5e
(BASELINE.md; the reference repo publishes no numbers of its own).

Timing notes:
- sustained-throughput protocol: dispatch ITERS executions back-to-back and
  device_get the last result — TPU executes launches in order, so syncing the
  last bounds them all (this backend's block_until_ready is unreliable, so
  the sync is an explicit small host transfer);
- the hot config uses the Pallas NMS kernel (detax/ops/nms_pallas.py) and the
  TPU-standard 1000/level pre-NMS candidate cap (the reference's GPU-era 6000
  setting only pads the suppression pool; post-NMS stays 1000 proposals).
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
SIZE = 640
WARMUP = 3
ITERS = 20
# batch 128 is optimal for every model: it exactly fills XLA's
# batch-in-lanes conv layout (the b64 RetinaNet audit measured its R50
# stage-1 convs at 14-27% MFU; 192 and 256 both measured slower on the
# flagship), and all four models' activations fit at b128 in bf16
BATCHES = {"frcnn": 128, "retinanet": 128, "yolo": 128, "mask": 128}
BATCH = 128


def _build(which: str):
    import jax.numpy as jnp

    from detax.configs import (
        FasterRCNNConf,
        FPNConf,
        PreprocessConf,
        ResNetConf,
        RetinaNetConf,
        YOLOConf,
    )
    from detax.models import FasterRCNN, RetinaNet, YOLO

    if which == "retinanet":
        # two_stage = candidate-set-faithful selection (anchor-first was
        # measured at -0.0156 mAP on a trained checkpoint, two_stage/approx
        # at +0.000x — artifacts/dmap_retinanet_r3.json); 524 vs 537 img/s
        conf = RetinaNetConf(
            preprocess=PreprocessConf(image_size=SIZE),
            final_nms_candidates=1024,
            nms_impl="pallas", topk_impl="two_stage", topk_recall=0.8,
        )
        return RetinaNet(conf=conf, dtype=jnp.bfloat16), "RetinaNet R50-FPN"
    if which == "yolo":
        # 256 candidates/level: dmAP-measured free down to k128 on a trained
        # checkpoint (artifacts/dmap_yolo_r3.json, every lever +-0.000x);
        # the final class-aware NMS over 3*k global candidates was YOLO's
        # largest remaining stage (9.9 ms at k=1000).
        conf = YOLOConf(
            preprocess=PreprocessConf(image_size=SIZE),
            nms_impl="pallas", topk_candidates=256,
        )
        return YOLO(conf=conf, dtype=jnp.bfloat16), "YOLO R18 3-stride"
    if which == "mask":
        # Mask R-CNN mode: the flagship serving profile + the 14x14 mask
        # pooler and 4-conv mask head on the top-100 detections
        base = FasterRCNNConf(preprocess=PreprocessConf(image_size=SIZE))
        conf = base.replace(
            rpn=base.rpn.replace(
                pre_nms_topk=(2000, 512), post_nms_topk=(2000, 256),
                nms_impl="pallas", topk_impl="approx", topk_recall=0.8,
            ),
            roi=base.roi.replace(
                nms_impl="pallas", topk_impl="approx", pre_nms_candidates=512,
                mask_on=True,
                box_pooler=base.roi.box_pooler.replace(
                    sampling_ratio=2, impl="pallas", keep_ph_pad=True
                ),
                mask_pooler=base.roi.mask_pooler.replace(impl="pallas"),
            ),
        )
        return FasterRCNN(conf=conf, dtype=jnp.bfloat16), "Mask R-CNN R18-FPN"

    # flagship TPU serving profile = the measured-quality-bounded lever set
    # ("serving_lean" in detax/train/profiles.py; ΔmAP vs the exact parity
    # oracle on a trained checkpoint — scripts/eval_dmap.py, r3: approx
    # top-k / recall-0.8 / Pallas NMS each ≤0.001, p192 +0.0004 standard;
    # on the DENSE stress set (32 objects/image, the lever's failure mode,
    # artifacts/dmap_dense_r3.json) p256 -0.0050, p192 -0.0063,
    # p128 -0.0088, and serving_lean (p192 + 384-candidate cuts) is
    # -0.0008 vs p192): Pallas NMS, Pallas image-resident ROIAlign at
    # sampling_ratio 2 (free in the kernel: bilinear weights are
    # host-precomputed), 384/level pre-NMS, 384 final-NMS candidates,
    # 192 proposals (vs the classic 300; the ROI stage scales with box
    # count). Reference *defaults* stay on the exact parity path.
    base = FasterRCNNConf(preprocess=PreprocessConf(image_size=SIZE))
    conf = base.replace(
        rpn=base.rpn.replace(
            pre_nms_topk=(2000, 384),
            post_nms_topk=(2000, 192),
            nms_impl="pallas",
            topk_impl="approx",
            topk_recall=0.8,
        ),
        roi=base.roi.replace(
            nms_impl="pallas",
            topk_impl="approx",
            pre_nms_candidates=384,
            box_pooler=base.roi.box_pooler.replace(
                sampling_ratio=2, impl="pallas", keep_ph_pad=True
            ),
        ),
    )
    return FasterRCNN(conf=conf, dtype=jnp.bfloat16), "Faster R-CNN R18-FPN"


def main() -> None:
    import jax
    import jax.numpy as jnp

    from detax.structures.image_batch import ImageBatch

    which = sys.argv[1] if len(sys.argv) > 1 else "frcnn"
    global BATCH
    BATCH = BATCHES.get(which, 128)
    model, name = _build(which)

    rng = np.random.RandomState(0)
    # pixels in the model's compute dtype: production preprocessing emits
    # bf16 (the stem casts to bf16 either way, so rounding is identical —
    # this only removes the f32 read + convert copy at the model entry)
    pixels = jnp.asarray(rng.randn(BATCH, SIZE, SIZE, 3), jnp.bfloat16)
    images = ImageBatch.from_pixels(pixels)

    init_images = ImageBatch.from_pixels(pixels[:1])
    params = jax.jit(model.init)(jax.random.PRNGKey(0), init_images)

    fwd = jax.jit(lambda p, im: model.apply(p, im))

    def sync(dets):
        np.asarray(dets.scores[:1, :1])  # tiny host transfer = real barrier

    t0 = time.perf_counter()
    sync(fwd(params, images))
    compile_s = time.perf_counter() - t0

    for _ in range(WARMUP):
        dets = fwd(params, images)
    sync(dets)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        dets = fwd(params, images)
    sync(dets)
    dt = time.perf_counter() - t0

    images_per_sec = BATCH * ITERS / dt
    print(
        json.dumps(
            {
                "metric": f"images/sec/chip @ 640x640 batched inference ({name}, bf16, Pallas NMS)",
                "value": round(images_per_sec, 2),
                "unit": "images/sec",
                "vs_baseline": round(images_per_sec / BASELINE_IMAGES_PER_SEC, 4),
            }
        )
    )
    print(
        f"# batch={BATCH} iters={ITERS} wall={dt:.3f}s compile={compile_s:.1f}s "
        f"batch_latency={dt / ITERS * 1000:.2f}ms device={jax.devices()[0]}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
