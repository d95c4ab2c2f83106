"""YOLO serving-profile quality budget gate (round-3 YOLO dmAP follow-up).

Same oracle philosophy as ``test_dmap_regression``
(`/root/reference/python/test/test_detectron.py:17-52` automated at the
metric level): train a tiny YOLO to a nontrivial checkpoint, then pin the
SERVING profile (256 candidates/level + Pallas NMS, as benched in bench.py)
within a fixed mAP budget of the exact parity path (1000 candidates + XLA
NMS). Full-scale evidence: ``artifacts/dmap_yolo_r3.json`` (every lever
±0.000x at 800 steps / 256²).

Requires the split objectness-BCE normalization in
``detax/models/yolo.py`` — with the old all-anchors average the head
collapses to background and no checkpoint strong enough to gate on exists.
"""

from __future__ import annotations

import pytest

from detax.configs import PreprocessConf, ResNetConf
from detax.configs.yolo import YOLOConf
from detax.train.profiles import eval_yolo_profile, train_yolo

SIZE = 128
CLASSES = 4
BUDGET = 0.02  # serving profile may cost at most 2 mAP points


def _tiny_base():
    return YOLOConf(
        backbone=ResNetConf(stage_blocks=(1, 1, 1, 1)),
        preprocess=PreprocessConf(image_size=SIZE),
        max_gt_boxes=16,
    )


@pytest.mark.slow
def test_yolo_serving_profile_within_map_budget():
    params, _ = train_yolo(
        SIZE, CLASSES, steps=300, batch=8, base_conf=_tiny_base(), num_images=64,
        log_every=0,
    )
    exact = eval_yolo_profile(params, SIZE, CLASSES, "exact", 24, 4, base_conf=_tiny_base())
    serving = eval_yolo_profile(params, SIZE, CLASSES, "serving", 24, 4, base_conf=_tiny_base())
    assert exact["AP50"] > 0.05, f"checkpoint too weak to gate on ({exact})"
    assert serving["mAP"] >= exact["mAP"] - BUDGET, (
        f"YOLO serving profile regressed: exact mAP={exact['mAP']:.4f}, "
        f"serving mAP={serving['mAP']:.4f}"
    )
