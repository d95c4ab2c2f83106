"""Region Proposal Network (reference ``RegionProposalNetwork``,
``python/src/models/rpn.py:17-357`` + ``find_top_rpn_proposals``,
``models/utils.py:9-109``).

TPU-native restructuring:

- the per-image Python loops of the reference (``rpn.py:161``,
  ``models/utils.py:74``) become batched array ops / ``vmap``;
- boolean-mask filtering becomes validity masks over fixed capacities;
- torchvision native NMS becomes :func:`detax.ops.nms.batched_nms`
  (level-offset trick, exactly the reference's semantics);
- pre-NMS selection uses ``lax.top_k`` *before* decoding so only the top-K
  deltas are decoded (the reference decodes every anchor then sorts —
  ``models/utils.py:47-65`` even notes sort-beats-topk on GPU; on TPU topk of
  logits is cheaper than decoding ~250k anchors);
- anchors are compile-time constants (see ``detax.nn.anchors``).

The flax module computes only the head; everything else is pure functions so
RPN slots into the one-jit detector forward.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from detax.configs.rpn import RegionProposalNetworkConf
from detax.nn.anchors import grid_anchors
from detax.nn.rpn_head import RPNHead
from detax.ops import box_transform
from detax.ops.losses import bce_with_logits, giou, smooth_l1
from detax.ops.matcher import match
from detax.ops.nms import batched_nms
from detax.ops.sampling import resample_labels
from detax.structures import boxes as box_ops
from detax.structures.detections import Detections, GroundTruth


class RegionProposalNetwork(nn.Module):
    """The NN part: per-level objectness logits + anchor deltas."""

    conf: RegionProposalNetworkConf
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, features: List[Array]) -> Tuple[List[Array], List[Array]]:
        head_conf = self.conf.head
        return RPNHead(
            num_anchors=head_conf.num_anchors,
            conv_dims=head_conf.conv_dims,
            box_dim=head_conf.box_dim,
            dtype=self.dtype,
            name="head",
        )(features)


def rpn_anchors(
    conf: RegionProposalNetworkConf,
    feature_shapes: Sequence[Tuple[int, int]],
    strides: Sequence[int],
) -> List[Array]:
    """Per-level ``(Ri, 4)`` anchors (constants under jit)."""
    return grid_anchors(
        feature_shapes,
        strides,
        conf.anchor_generator.sizes,
        conf.anchor_generator.aspect_ratios,
        conf.anchor_generator.offset,
    )


def predict_proposals(
    conf: RegionProposalNetworkConf,
    anchors: List[Array],
    logits: List[Array],
    deltas: List[Array],
    image_sizes: Array,
    train: bool,
    feature_shapes: Optional[Sequence[Tuple[int, int]]] = None,
    strides: Optional[Sequence[int]] = None,
) -> Detections:
    """Decode + select top proposals (reference ``predict_proposals`` →
    ``find_top_rpn_proposals``, ``rpn.py:294-348`` + ``models/utils.py:9-109``).

    Args:
      anchors: per-level ``(Ri, 4)``.
      logits: per-level ``(B, Ri)`` objectness.
      deltas: per-level ``(B, Ri, 4)``.
      image_sizes: ``(B, 2)`` valid (h, w) per image for clipping.
      feature_shapes/strides: per-level grid geometry; when given, selected
        anchors are reconstructed arithmetically from the top-k indices
        (:func:`detax.nn.anchors.anchors_from_indices` — bit-identical to the
        gather, ~1.7 ms/level cheaper at serving shapes).

    Returns:
      ``Detections`` with capacity ``post_nms_topk`` per image, sorted by
      objectness (scores are logits, classes hold the source level index).
    """
    pre_k = conf.pre_nms_topk[0] if train else conf.pre_nms_topk[1]
    post_k = conf.post_nms_topk[0] if train else conf.post_nms_topk[1]
    ag = conf.anchor_generator
    num_levels = len(logits)

    top_boxes, top_scores, top_levels, top_valid = [], [], [], []
    for lvl, (anch, lg, dl) in enumerate(zip(anchors, logits, deltas)):
        k = min(pre_k, lg.shape[-1])
        # top-k *before* decode: only k boxes ever get decoded; both top_k and
        # approx_max_k return score-descending order (needed by the Pallas NMS
        # path). approx_max_k is the TPU-native PartialReduce selection — see
        # RegionProposalNetworkConf.topk_impl; topk_recall trades per-row
        # recall for PartialReduce output size (0.95 default = jax default).
        if conf.topk_impl == "approx" and k < lg.shape[-1]:
            sc, idx = jax.lax.approx_max_k(lg, k, recall_target=conf.topk_recall)
        else:
            sc, idx = jax.lax.top_k(lg, k)  # (B, k)
        sel_deltas = jnp.take_along_axis(dl, idx[..., None], axis=1)  # (B, k, 4)
        if feature_shapes is not None and strides is not None:
            from detax.nn.anchors import _broadcast_per_level, anchors_from_indices

            sel_anchors = anchors_from_indices(
                idx,
                feature_shapes[lvl],
                strides[lvl],
                _broadcast_per_level(ag.sizes, num_levels)[lvl],
                _broadcast_per_level(ag.aspect_ratios, num_levels)[lvl],
                ag.offset,
            )
        else:
            sel_anchors = jnp.take(anch, idx, axis=0)  # (B, k, 4)
        bx = box_transform.apply_deltas(
            sel_deltas,
            sel_anchors,
            conf.box2box_transform.weights,
            conf.box2box_transform.scale_clamp,
        )
        # clip to the per-image valid region (reference models/utils.py:86);
        # finite + min-size filters become a validity mask
        bx = box_ops.clip(bx, image_sizes[:, 0:1], image_sizes[:, 1:2])
        valid = (
            jnp.all(jnp.isfinite(bx), axis=-1)
            & jnp.isfinite(sc)
            & box_ops.nonempty(bx, conf.min_box_size)
        )
        top_boxes.append(bx)
        top_scores.append(sc)
        top_levels.append(jnp.full(sc.shape, lvl, jnp.int32))
        top_valid.append(valid)

    if conf.nms_impl == "pallas":
        # Per-level NMS keep masks (boxes of different levels never suppress
        # each other — the level-offset trick of the reference is equivalent
        # to per-level passes), ALL levels stacked into one kernel call (the
        # per-level-call form paid ~87 µs × L of in-graph call overhead —
        # docs/kernel-notebook.md §NMS), then one global top-k over the kept
        # candidates' scores.
        from detax.ops.nms_pallas import nms_keep_sorted_multilevel

        keeps = nms_keep_sorted_multilevel(top_boxes, top_valid, conf.nms_thresh)
        boxes = jnp.concatenate(top_boxes, axis=1)
        scores = jnp.concatenate(top_scores, axis=1)
        levels = jnp.concatenate(top_levels, axis=1)
        kept = jnp.concatenate(keeps, axis=1)
        gated = jnp.where(kept, scores, -jnp.inf)
        ps, top_idx = jax.lax.top_k(gated, post_k)  # (B, post_k)
        pb = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)
        plvl = jnp.take_along_axis(levels, top_idx, axis=1)
        ok = ps > -jnp.inf
        return Detections(boxes=pb, scores=jnp.where(ok, ps, -jnp.inf), classes=plvl, valid=ok)

    boxes = jnp.concatenate(top_boxes, axis=1)  # (B, K, 4)
    scores = jnp.concatenate(top_scores, axis=1)
    levels = jnp.concatenate(top_levels, axis=1)
    valid = jnp.concatenate(top_valid, axis=1)

    def per_image(b, s, lv, v):
        idx, ok = batched_nms(b, s, lv, conf.nms_thresh, post_k, valid=v)
        return (
            jnp.take(b, idx, axis=0),
            jnp.take(s, idx),
            jnp.take(lv, idx),
            ok,
        )

    pb, ps, pl, ok = jax.vmap(per_image)(boxes, scores, levels, valid)
    return Detections(boxes=pb, scores=ps, classes=pl, valid=ok)


def label_and_sample_anchors(
    key: Array,
    conf: RegionProposalNetworkConf,
    anchors: Array,
    gt: GroundTruth,
    image_sizes: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """GT assignment + fg/bg subsampling (reference
    ``label_and_sample_anchors``, ``rpn.py:134-185``; runs under
    ``stop_gradient`` instead of ``@torch.no_grad``).

    Args:
      anchors: ``(R, 4)`` all levels concatenated.
      gt: padded ground truth.

    Returns:
      ``gt_labels``: ``(B, R)`` in {-1 ignore, 0 bg, 1 fg} after sampling
      (256 @ 50% by default);
      ``matched_gt_boxes``: ``(B, R, 4)`` box of the matched GT per anchor.
    """
    m = conf.anchor_matcher

    iou = box_ops.pairwise_iou(gt.boxes, anchors[None])  # (B, G, R)
    matched_idx, labels = jax.vmap(
        lambda q, v: match(q, v, m.iou_thresholds, m.iou_labels, m.allow_low_quality_matches)
    )(iou, gt.valid)

    if conf.anchor_boundary_thresh >= 0 and image_sizes is not None:
        inside = box_ops.inside_box(
            anchors[None], (image_sizes[:, 0:1], image_sizes[:, 1:2]), conf.anchor_boundary_thresh
        )
        labels = jnp.where(inside, labels, jnp.int8(-1))

    keys = jax.random.split(key, labels.shape[0])
    labels = jax.vmap(
        lambda k, l: resample_labels(k, l, conf.batch_size_per_image, conf.positive_fraction)
    )(keys, labels.astype(jnp.int32))

    matched_gt_boxes = jnp.take_along_axis(gt.boxes, matched_idx[..., None], axis=1)
    return jax.lax.stop_gradient(labels), jax.lax.stop_gradient(matched_gt_boxes)


def rpn_losses(
    conf: RegionProposalNetworkConf,
    anchors: Array,
    logits: Array,
    deltas: Array,
    gt_labels: Array,
    matched_gt_boxes: Array,
) -> Tuple[Dict[str, Array], Dict[str, Array]]:
    """RPN losses (reference ``losses``, ``rpn.py:187-244``).

    Args:
      anchors: ``(R, 4)``; logits ``(B, R)``; deltas ``(B, R, 4)``.

    Returns:
      (losses dict with the reference's keys ``loss_rpn_cls`` /
      ``loss_rpn_loc``, metrics dict with the reference's ``Logs`` scalar
      names ``rpn/num_pos_anchors`` / ``rpn/num_neg_anchors``).
    """
    num_images = logits.shape[0]
    pos = gt_labels == 1
    valid = gt_labels >= 0

    metrics = {
        "rpn/num_pos_anchors": jnp.sum(pos) / num_images,
        "rpn/num_neg_anchors": jnp.sum(gt_labels == 0) / num_images,
    }

    if conf.box_reg_loss_type == "smooth_l1":
        target_deltas = box_transform.get_deltas(
            anchors[None], matched_gt_boxes, conf.box2box_transform.weights
        )
        loc = smooth_l1(deltas, target_deltas, conf.smooth_l1_beta)
        loss_loc = jnp.sum(loc * pos[..., None])
    elif conf.box_reg_loss_type == "giou":
        pred_boxes = box_transform.apply_deltas(
            deltas, anchors[None], conf.box2box_transform.weights, conf.box2box_transform.scale_clamp
        )
        loss_loc = jnp.sum(giou(pred_boxes, matched_gt_boxes) * pos)
    else:
        raise ValueError(f"Invalid rpn box reg loss type '{conf.box_reg_loss_type}'")

    cls = bce_with_logits(logits, (gt_labels == 1).astype(jnp.float32))
    loss_cls = jnp.sum(cls * valid)

    normalizer = conf.batch_size_per_image * num_images
    return (
        {
            "loss_rpn_cls": loss_cls / normalizer * conf.loss_weight_cls,
            "loss_rpn_loc": loss_loc / normalizer * conf.loss_weight_loc,
        },
        metrics,
    )
