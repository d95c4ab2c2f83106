"""End-to-end box-parity gate: detax proposals/detections vs an independent
PyTorch + numpy oracle on identical weights and inputs.

This is the BASELINE fidelity gate ("boxes within 1e-4 IoU of the PyTorch
reference fp32 forward") and the automated version of the reference's
de-facto oracle pattern (`/root/reference/python/test/test_detectron.py:17-52`,
`/root/reference/python/src/models/utils.py:9-109`):

  torch ResNet-18 (randomized BN stats) ──► detax backbone (weight import)
  detax FPN/RPN-head/box-head weights  ──► torch FPN + RPN head oracle
  proposal selection + ROIAlign + box head + NMS re-derived in numpy

and then, on the same fixed input batch:

  detax `FasterRCNN.propose`  vs  torch-conv → numpy pipeline   (proposals)
  detax full inference        vs  numpy ROI stage               (detections)

Any transpose/layout/convention regression anywhere in the pipeline breaks
the per-rank IoU ≥ 1 - 1e-4 assertion.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from detax.configs import FasterRCNNConf, PreprocessConf
from detax.configs.roi import BoxHeadConf
from detax.models import FasterRCNN
from detax.structures.image_batch import ImageBatch
from detax.train.torch_import import import_resnet, merge_pretrained
from tests.oracles import decode_deltas, greedy_nms, iou_matrix, roi_align_oracle
from tests.torch_ref import (
    TorchFPN,
    TorchRPNHead,
    load_fpn_from_detax,
    load_rpn_head_from_detax,
    randomized_resnet18,
)

SIZE = 192
BATCH = 2
NUM_CLASSES = 8
PRE_K, POST_K = 256, 48
SCALE_CLAMP = math.log(1000.0 / 16)
STRIDES = [4, 8, 16, 32, 64]  # p1..p5
ROI_STRIDES = [4, 8, 16, 32]  # p1..p4


def _conf():
    base = FasterRCNNConf(preprocess=PreprocessConf(image_size=SIZE))
    return base.replace(
        rpn=base.rpn.replace(pre_nms_topk=(PRE_K, PRE_K), post_nms_topk=(POST_K, POST_K)),
        roi=base.roi.replace(
            num_classes=NUM_CLASSES,
            pre_nms_candidates=128,
            detections_per_image=16,
            box_head=BoxHeadConf(num_fc=2, fc_dim=128),
        ),
    )


@pytest.fixture(scope="module")
def setup():
    conf = _conf()
    model = FasterRCNN(conf=conf)  # fp32
    rng = np.random.RandomState(7)
    pixels = rng.randn(BATCH, SIZE, SIZE, 3).astype(np.float32)
    images = ImageBatch.from_pixels(jnp.asarray(pixels))

    params = model.init(jax.random.PRNGKey(3), images)
    # backbone weights from the torch oracle (tests the import direction)
    tbb = randomized_resnet18(seed=5)
    imported = import_resnet(tbb.state_dict(), norm="frozen_bn")
    bottom_up = merge_pretrained(
        {"params": params["params"]["backbone"]["bottom_up"]}, imported
    )["params"]
    params = {
        "params": {
            **params["params"],
            "backbone": {**params["params"]["backbone"], "bottom_up": bottom_up},
        }
    }

    # FPN/RPN-head weights into the torch oracle (tests the export direction)
    tfpn = TorchFPN()
    load_fpn_from_detax(tfpn, params["params"]["backbone"])
    trpn = TorchRPNHead()
    load_rpn_head_from_detax(trpn, params["params"]["rpn"]["head"])

    with torch.no_grad():
        tfeats = tbb(torch.from_numpy(pixels.transpose(0, 3, 1, 2)))
        pfeats = tfpn(tfeats)
        levels = [pfeats[f"p{i}"] for i in range(1, 6)]
        logits_t, deltas_t = trpn(levels)
    np_feats = {k: v.numpy().transpose(0, 2, 3, 1) for k, v in pfeats.items()}
    logits_np = [l.numpy() for l in logits_t]
    deltas_np = [d.numpy() for d in deltas_t]
    return conf, model, params, images, np_feats, logits_np, deltas_np


def _np_anchors(h, w, stride, sizes=(None,), ratios=(0.5, 1.0, 2.0)):
    """Reference `generate_cell_anchors` + `_grid_anchors`
    (`anchor_generators.py:136-210`), independent numpy implementation."""
    size = {4: 32, 8: 64, 16: 128, 32: 256, 64: 512}[stride]
    cell = []
    for ar in ratios:
        cw = math.sqrt(size * size / ar)
        ch = ar * cw
        cell.append([-cw / 2, -ch / 2, cw / 2, ch / 2])
    cell = np.asarray(cell)
    sx = np.arange(w) * stride
    sy = np.arange(h) * stride
    shifts = np.stack(
        [np.tile(sx[None, :], (h, 1)), np.tile(sy[:, None], (1, w))] * 2, axis=-1
    )  # (H, W, 4) = (x, y, x, y)
    anchors = shifts[:, :, None, :] + cell[None, None, :, :]
    return anchors.reshape(-1, 4)


def _np_proposals(conf, logits_np, deltas_np):
    """Numpy re-derivation of `predict_proposals` (exact topk, xla NMS)."""
    out = []
    for b in range(BATCH):
        cand = []
        for lvl, (lg, dl) in enumerate(zip(logits_np, deltas_np)):
            stride = STRIDES[lvl]
            hw = SIZE // stride
            anch = _np_anchors(hw, hw, stride)
            k = min(PRE_K, lg.shape[-1])
            order = np.argsort(-lg[b], kind="stable")[:k]
            boxes = decode_deltas(
                dl[b][order], anch[order], weights=(1, 1, 1, 1), scale_clamp=SCALE_CLAMP
            )
            boxes[:, 0::2] = boxes[:, 0::2].clip(0, SIZE)
            boxes[:, 1::2] = boxes[:, 1::2].clip(0, SIZE)
            ok = (boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
            boxes, scores = boxes[ok], lg[b][order][ok]
            keep = greedy_nms(boxes, scores, conf.rpn.nms_thresh)
            for i in keep:
                cand.append((scores[i], lvl, boxes[i]))
        cand.sort(key=lambda r: -r[0])
        cand = cand[:POST_K]
        out.append(cand)
    return out


def test_proposal_box_parity(setup):
    conf, model, params, images, _, logits_np, deltas_np = setup
    want = _np_proposals(conf, logits_np, deltas_np)

    props = model.apply(params, images, method=lambda m, im: m.propose(im))
    got_boxes = np.asarray(props.boxes)
    got_scores = np.asarray(props.scores)
    got_valid = np.asarray(props.valid)

    for b in range(BATCH):
        n = min(len(want[b]), int(got_valid[b].sum()))
        assert n >= 20, f"too few proposals to compare ({n})"
        for i in range(n):
            ws, wl, wb = want[b][i]
            iou = iou_matrix(wb[None], got_boxes[b, i][None])[0, 0]
            assert iou >= 1 - 1e-4, (
                f"img {b} proposal {i}: IoU {iou:.6f} torch={wb} detax={got_boxes[b, i]}"
            )
            np.testing.assert_allclose(got_scores[b, i], ws, rtol=2e-3, atol=2e-3)


def _np_detections(conf, np_feats, proposals, P):
    """Numpy re-derivation of pool → box head → `fast_rcnn_inference`."""
    roi = conf.roi
    w_fc0 = np.asarray(P["roi"]["box_head"]["fc0"]["kernel"])
    b_fc0 = np.asarray(P["roi"]["box_head"]["fc0"]["bias"])
    w_fc1 = np.asarray(P["roi"]["box_head"]["fc1"]["kernel"])
    b_fc1 = np.asarray(P["roi"]["box_head"]["fc1"]["bias"])
    w_cls = np.asarray(P["roi"]["box_predictor"]["cls_score"]["kernel"])
    b_cls = np.asarray(P["roi"]["box_predictor"]["cls_score"]["bias"])
    w_box = np.asarray(P["roi"]["box_predictor"]["bbox_pred"]["kernel"])
    b_box = np.asarray(P["roi"]["box_predictor"]["bbox_pred"]["bias"])

    results = []
    for b in range(BATCH):
        boxes = np.stack([p[2] for p in proposals[b]])
        n = len(boxes)
        # level assignment (FPN eqn 1) + per-box oracle ROIAlign
        area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        lvl = np.floor(4 + np.log2(np.sqrt(np.clip(area, 0, None)) / 224 + 1e-8))
        lvl = np.clip(lvl, 2, 5).astype(int)
        pooled = np.zeros((n, 7, 7, 64), np.float32)
        for i in range(n):
            l = lvl[i] - 2
            pooled[i] = roi_align_oracle(
                np_feats[f"p{l+1}"][b],
                boxes[i : i + 1],
                1.0 / ROI_STRIDES[l],
                (7, 7),
                roi.box_pooler.sampling_ratio,
                True,
            )[0]
        x = pooled.reshape(n, -1)
        x = np.maximum(x @ w_fc0 + b_fc0, 0)
        x = np.maximum(x @ w_fc1 + b_fc1, 0)
        scores = x @ w_cls + b_cls  # (n, C+1)
        deltas = (x @ w_box + b_box).reshape(n, NUM_CLASSES, 4)
        probs = np.exp(scores - scores.max(-1, keepdims=True))
        probs = (probs / probs.sum(-1, keepdims=True))[:, :-1]  # (n, C)

        dec = np.stack(
            [
                decode_deltas(
                    deltas[:, c],
                    boxes,
                    weights=roi.box2box_transform.weights,
                    scale_clamp=SCALE_CLAMP,
                )
                for c in range(NUM_CLASSES)
            ],
            axis=1,
        )  # (n, C, 4)
        dec[..., 0::2] = dec[..., 0::2].clip(0, SIZE)
        dec[..., 1::2] = dec[..., 1::2].clip(0, SIZE)

        flat_scores = probs.reshape(-1)
        flat_boxes = dec.reshape(-1, 4)
        flat_classes = np.tile(np.arange(NUM_CLASSES), n)
        gate = (
            (flat_scores > roi.score_thresh)
            & (flat_boxes[:, 2] > flat_boxes[:, 0])
            & (flat_boxes[:, 3] > flat_boxes[:, 1])
        )
        order = np.argsort(-np.where(gate, flat_scores, -np.inf), kind="stable")
        order = order[gate[order]][: roi.pre_nms_candidates]
        cb, cs, cc = flat_boxes[order], flat_scores[order], flat_classes[order]
        # class-aware NMS via coordinate offsets
        off = cc.astype(np.float64) * (cb.max() + 1.0)
        keep = greedy_nms(cb + off[:, None], cs, roi.nms_thresh)
        keep = keep[: roi.detections_per_image]
        results.append([(cs[i], int(cc[i]), cb[i]) for i in keep])
    return results


def test_detection_box_parity(setup):
    conf, model, params, images, np_feats, logits_np, deltas_np = setup
    proposals = _np_proposals(conf, logits_np, deltas_np)
    want = _np_detections(conf, np_feats, proposals, params["params"])

    dets = model.apply(params, images)
    got_boxes = np.asarray(dets.boxes)
    got_scores = np.asarray(dets.scores)
    got_classes = np.asarray(dets.classes)
    got_valid = np.asarray(dets.valid)

    for b in range(BATCH):
        n = min(len(want[b]), int(got_valid[b].sum()), 10)
        assert n >= 3, f"too few detections to compare ({n})"
        for i in range(n):
            ws, wc, wb = want[b][i]
            iou = iou_matrix(wb[None], got_boxes[b, i][None])[0, 0]
            assert iou >= 1 - 1e-3, (
                f"img {b} det {i}: IoU {iou:.6f} oracle={wb} detax={got_boxes[b, i]}"
            )
            assert int(got_classes[b, i]) == wc
            np.testing.assert_allclose(got_scores[b, i], ws, rtol=5e-3, atol=5e-3)
