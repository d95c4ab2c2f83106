"""Per-fusion audit of the RetinaNet serving program (reuses profile_hlo)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from profile_hlo import aggregate, capture, PEAK_BF16_FLOPS


def main(batch=64, iters=5):
    from detax.configs import PreprocessConf, RetinaNetConf
    from detax.models import RetinaNet
    from detax.structures.image_batch import ImageBatch

    conf = RetinaNetConf(
        preprocess=PreprocessConf(image_size=640),
        nms_impl="pallas", topk_impl="two_stage", topk_recall=0.8,
        final_nms_candidates=1024,  # the benched r4 cap
    )
    model = RetinaNet(conf=conf, dtype=jnp.bfloat16)
    images = ImageBatch.from_pixels(jnp.zeros((batch, 640, 640, 3), jnp.bfloat16))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images)

    def fwd(p, im):
        d = model.apply(p, im)
        return d.boxes.sum() + d.scores.sum()

    data = capture(jax.jit(fwd), params, images, iters)
    rows = aggregate(data, iters)
    total = sum(r["ms_per_iter"] for r in rows)
    conv_ms = sum(r["ms_per_iter"] for r in rows if "convolution" in r["category"])
    conv_fl = sum(r["gflops"] for r in rows if "convolution" in r["category"])
    print(f"\ndevice total {total:.1f} ms | conv {conv_ms:.1f} ms "
          f"({conv_fl / conv_ms * 1e3 / (PEAK_BF16_FLOPS / 1e9):.1%} MFU)")
    print(f"{'ms':>8} {'x':>4} {'MFU':>6} {'HBM':>6} {'category':<20} op")
    for r in rows[:30]:
        print(f"{r['ms_per_iter']:8.3f} {r['calls_per_iter']:4d} "
              f"{r['mfu']:6.1%} {r['hbm_util']:6.1%} {r['category']:<20.20} {r['op'][:55]}")


if __name__ == "__main__":
    main(*(int(x) for x in sys.argv[1:]))
