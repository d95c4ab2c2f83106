"""CLI model-family selection (`--model frcnn|retinanet|yolo`).

The reference ships one hardwired demo runner (`/root/reference/runner.py`);
detax's CLI trains/serves every family through one entry point. This covers
the conf plumbing per family+profile; the full train/serve drives live on
TPU (train 3 steps + serve HTTP probe per family, this round's verify log).
"""

from __future__ import annotations

import pytest

from detax.cli import _build_model
from detax.models import FasterRCNN, RetinaNet, YOLO


def test_family_confs():
    m, conf = _build_model(128, 5, family="frcnn", profile="tpu")
    assert isinstance(m, FasterRCNN)
    assert conf.roi.num_classes == 5 and conf.roi.nms_impl == "pallas"

    m, conf = _build_model(128, 5, family="retinanet", profile="tpu")
    assert isinstance(m, RetinaNet)
    assert conf.num_classes == 5
    assert conf.topk_impl == "two_stage" and conf.nms_impl == "pallas"

    m, conf = _build_model(128, 5, family="yolo", profile="tpu")
    assert isinstance(m, YOLO)
    assert conf.num_classes == 5
    assert conf.topk_candidates == 256 and conf.nms_impl == "pallas"

    # reference profile keeps each family's exact parity path
    _, conf = _build_model(128, 5, family="retinanet", profile="reference")
    assert conf.topk_impl == "exact" and conf.nms_impl == "xla"
    _, conf = _build_model(128, 5, family="yolo", profile="reference")
    assert conf.topk_candidates == 1000 and conf.nms_impl == "xla"


def test_family_errors():
    with pytest.raises(ValueError):
        _build_model(128, 5, family="detr")
    with pytest.raises(ValueError):
        _build_model(128, 5, family="yolo", mask_on=True)
