"""Serving-profile quality budget gate (VERDICT r2 item 4).

Trains the flagship at micro scale on synthetic data to a nontrivial mAP,
then pins the SERVING profile (approx top-k + Pallas NMS + Pallas pooler +
reduced candidates, as benched in bench.py) within a fixed mAP budget of
the exact parity path — the metric-level automation of the reference's
oracle philosophy (`/root/reference/python/test/test_detectron.py:17-52`).
"""

from __future__ import annotations

import numpy as np
import pytest

from detax.configs import FasterRCNNConf, FPNConf, PreprocessConf, ResNetConf
from detax.configs.roi import BoxHeadConf
from detax.train.profiles import build_frcnn_conf, eval_profile, train_flagship

SIZE = 128
CLASSES = 4
BUDGET = 0.02  # serving profile may cost at most 2 mAP points


def _tiny_base():
    base = FasterRCNNConf(
        backbone=FPNConf(bottom_up=ResNetConf(stage_blocks=(1, 1, 1, 1))),
        preprocess=PreprocessConf(image_size=SIZE),
    )
    return base.replace(
        rpn=base.rpn.replace(
            pre_nms_topk=(512, 256), post_nms_topk=(256, 128), batch_size_per_image=64
        ),
        roi=base.roi.replace(
            batch_size_per_image=64,
            box_head=BoxHeadConf(num_fc=1, fc_dim=128),
            detections_per_image=32,
            pre_nms_candidates=256,
        ),
        max_gt_boxes=16,
    )


@pytest.mark.slow
def test_serving_profile_within_map_budget():
    # 100 steps / 32 eval images: at 60 steps the checkpoint is weak enough
    # that the gap between profiles is eval noise (measured swinging from
    # +0.020 to -0.003 across seed-level perturbations); from ~100 steps the
    # serving profile tracks exact within noise on this recipe
    params, _ = train_flagship(
        SIZE, CLASSES, steps=100, batch=4, base_conf=_tiny_base(), num_images=64,
        log_every=0,
    )
    exact = eval_profile(params, SIZE, CLASSES, "exact", 32, 4, base_conf=_tiny_base())
    serving = eval_profile(
        params, SIZE, CLASSES, "serving_fast_p256", 32, 4, base_conf=_tiny_base()
    )
    assert exact["mAP"] > 0.05, f"checkpoint too weak to gate on ({exact})"
    assert serving["mAP"] >= exact["mAP"] - BUDGET, (
        f"serving profile regressed: exact mAP={exact['mAP']:.4f}, "
        f"serving mAP={serving['mAP']:.4f}"
    )
