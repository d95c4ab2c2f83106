"""ROI heads: proposal labeling/sampling, box head, Fast R-CNN inference.

Completes the reference's ``ROIHeads``/``StandardROIHeads``
(``python/src/models/roi.py:15-373``) whose ``forward`` was never implemented
(defect M3) and whose box head could not construct (M4): detax provides the
full train path (label → sample → pool → head → losses) and the full
inference path (per-class decode → score gate → class-aware NMS), all
static-shaped.

TPU restructuring vs the reference:
- per-image loops (``roi.py:155``) → ``vmap``;
- dynamic sampled-set sizes → exactly ``batch_size_per_image`` ROI slots per
  image selected by ranked random priorities, with a validity mask for the
  (rare) shortfall;
- GT-augmentation (``add_ground_truth_to_proposals``,
  ``models/utils.py:111-155``) → concatenation of the padded GT block, with
  the reference's ~+inf objectness logit (it uses logit 40.8) on valid rows.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from detax.configs.roi import ROIConf
from detax.nn.box_head import FastRCNNConvFCHead, FastRCNNOutputLayers
from detax.ops import box_transform
from detax.ops.losses import smooth_l1, softmax_cross_entropy
from detax.ops.matcher import match
from detax.ops.nms import multiclass_nms
from detax.ops.roi_align import multiscale_roi_align
from detax.ops.sampling import subsample_labels
from detax.structures import boxes as box_ops
from detax.structures.detections import Detections, GroundTruth

# The reference gives GT-proposals logit log((1-1e-10)/1e-10) ≈ 23 (float32)
# (models/utils.py:135-142); any large finite value works.
_GT_LOGIT = 23.0


class StandardROIHeads(nn.Module):
    """The NN part: pooled features → box head → (scores, deltas); plus the
    mask head when ``conf.mask_on`` (the reference reserved these slots as
    dead code, ``roi.py:307-340``)."""

    conf: ROIConf
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        from detax.nn.mask_head import MaskRCNNHead

        h = self.conf.box_head
        self.box_head = FastRCNNConvFCHead(
            num_conv=h.num_conv, conv_dim=h.conv_dim, num_fc=h.num_fc, fc_dim=h.fc_dim,
            norm=h.norm, dtype=self.dtype,
        )
        self.box_predictor = FastRCNNOutputLayers(
            num_classes=self.conf.num_classes, dtype=self.dtype
        )
        if self.conf.mask_on:
            m = self.conf.mask_head
            self.mask_head = MaskRCNNHead(
                num_classes=self.conf.num_classes, num_convs=m.num_convs,
                conv_dim=m.conv_dim, dtype=self.dtype,
            )
        if self.conf.keypoint_on:
            from detax.nn.keypoint_head import KeypointRCNNHead

            k = self.conf.keypoint_head
            self.keypoint_head = KeypointRCNNHead(
                num_keypoints=k.num_keypoints, num_convs=k.num_convs,
                conv_dim=k.conv_dim, dtype=self.dtype,
            )

    def __call__(self, pooled: Array, train: bool = False) -> Tuple[Array, Array]:
        return self.box_predictor(self.box_head(pooled, train=train))

    def mask_forward(self, pooled: Array, train: bool = False) -> Array:
        """(…, 14, 14, C) mask-pooled features → (…, 28, 28, num_classes)."""
        return self.mask_head(pooled, train=train)

    def keypoint_forward(self, pooled: Array, train: bool = False) -> Array:
        """(…, 14, 14, C) → (…, 56, 56, K) keypoint heatmap logits."""
        return self.keypoint_head(pooled, train=train)


def pad_box_head_params_for_ph_pad(
    params, conf: "ROIConf", channels: int = 64
):
    """Pad the box head's fc0 kernel for the pooler's ``keep_ph_pad`` layout.

    With ``keep_ph_pad`` the Pallas pooler returns ``(B, R, 8, pw, C)``
    where row 7 is exactly zero; the flattened feature width grows from
    ``ph*pw*C`` to ``8*pw*C``. Zero activations make the extra kernel rows
    inert, so padding fc0's kernel with zeros reproduces the exact sliced
    result while XLA skips the kernel-output reshape/slice/relayout chain.

    Transforms a checkpoint trained on the standard ``(7, pw)`` layout; a
    model *initialised* under ``keep_ph_pad`` already has the wide kernel.
    Requires ``num_conv == 0`` (a conv over the pad row would see a zero
    row inside its receptive field and change edge outputs).
    """
    h = conf.box_head
    assert h.num_conv == 0, "keep_ph_pad requires a pure-FC box head"
    ph, pw = conf.box_pooler.output_size
    narrow = ph * pw * channels
    wide = 8 * pw * channels

    def walk(tree, in_box_head=False):
        if not isinstance(tree, dict):
            return tree
        out = {}
        for k, v in tree.items():
            if in_box_head and k == "fc0" and isinstance(v, dict):
                kern = v.get("kernel")
                if kern is not None and kern.shape[0] == narrow:
                    kern = jnp.pad(
                        kern.reshape(ph, pw * channels, -1),
                        ((0, 8 - ph), (0, 0), (0, 0)),
                    ).reshape(wide, -1)
                    v = {**v, "kernel": kern}
                out[k] = v
            else:
                out[k] = walk(v, in_box_head or k == "box_head")
        return out

    return walk(params)


def pool_features(
    conf: ROIConf,
    features: Dict[str, Array],
    feature_strides: Dict[str, int],
    boxes: Array,
) -> Array:
    """Multi-level ROIAlign over ``conf.in_features`` (reference
    ``ROIPooler.forward``, ``roi_poolers.py:269-331``)."""
    feats = [features[f] for f in conf.in_features]
    strides = [feature_strides[f] for f in conf.in_features]
    p = conf.box_pooler
    if p.impl in ("pallas", "pallas_q8") and p.type == "ROIAlignV2":
        from detax.ops.roi_align_pallas import multiscale_roi_align_pallas

        return multiscale_roi_align_pallas(
            feats,
            boxes,
            strides,
            output_size=p.output_size,
            sampling_ratio=p.sampling_ratio,
            canonical_box_size=p.canonical_box_size,
            canonical_level=p.canonical_level,
            keep_ph_pad=p.keep_ph_pad,
            quantize=p.impl == "pallas_q8",
        )
    if p.impl == "window" and p.type == "ROIAlignV2":
        from detax.ops.roi_align import multiscale_roi_align_window

        return multiscale_roi_align_window(
            feats,
            boxes,
            strides,
            output_size=p.output_size,
            sampling_ratio=p.sampling_ratio,
            canonical_box_size=p.canonical_box_size,
            canonical_level=p.canonical_level,
        )
    return multiscale_roi_align(
        feats,
        boxes,
        strides,
        output_size=p.output_size,
        sampling_ratio=p.sampling_ratio,
        aligned=p.type == "ROIAlignV2",
        canonical_box_size=p.canonical_box_size,
        canonical_level=p.canonical_level,
    )


def add_ground_truth_to_proposals(proposals: Detections, gt: GroundTruth) -> Detections:
    """Append (padded) GT boxes as proposals (reference
    ``add_ground_truth_to_proposals``, ``models/utils.py:111-155``)."""
    b, g = gt.boxes.shape[0], gt.boxes.shape[1]
    gt_dets = Detections(
        boxes=gt.boxes,
        scores=jnp.where(gt.valid, _GT_LOGIT, -jnp.inf),
        classes=jnp.zeros((b, g), jnp.int32),
        valid=gt.valid,
    )
    return Detections.concatenate([proposals, gt_dets])


def label_and_sample_proposals(
    key: Array,
    conf: ROIConf,
    proposals: Detections,
    gt: GroundTruth,
) -> Tuple[Array, Array, Array, Array, Array, Dict[str, Array]]:
    """Match proposals to GT, subsample a fixed ROI batch per image.

    (reference ``label_and_sample_proposals``, ``roi.py:107-193`` +
    ``_sample_proposals``, ``roi.py:68-105``.)

    Returns per-image fixed-size (``batch_size_per_image``) arrays:
      ``boxes (B, S, 4)``, ``gt_classes (B, S)`` (num_classes = background),
      ``target_boxes (B, S, 4)``, ``is_fg (B, S)``, ``valid (B, S)``,
      ``matched_gt_idx (B, S)`` (for mask targets),
      and a metrics dict (reference ``Logs`` names ``roi_head/num_fg_samples``
      / ``roi_head/num_bg_samples``). Slots are ordered foreground-first.
    """
    if conf.proposal_append_gt:
        proposals = add_ground_truth_to_proposals(proposals, gt)

    num_classes = conf.num_classes
    m = conf.proposal_matcher
    s = conf.batch_size_per_image

    iou = box_ops.pairwise_iou(gt.boxes, proposals.boxes)  # (B, G, P)
    # mask padded proposals so they can't match (quality 0 → background)
    iou = jnp.where(proposals.valid[:, None, :], iou, 0.0)
    matched_idx, matched_labels = jax.vmap(
        lambda q, v: match(q, v, m.thresholds, m.labels, m.allow_low_quality_matches)
    )(iou, gt.valid)

    has_gt = gt.num_valid() > 0  # (B,)
    gt_classes = jnp.take_along_axis(gt.classes, matched_idx, axis=1)  # (B, P)
    gt_classes = jnp.where(matched_labels == 0, num_classes, gt_classes)  # bg
    gt_classes = jnp.where(matched_labels == -1, -1, gt_classes)  # ignore
    # no GT in image → everything background (reference roi.py:168-171)
    gt_classes = jnp.where(has_gt[:, None], gt_classes, num_classes)
    # padded proposal slots are never used
    gt_classes = jnp.where(proposals.valid, gt_classes, -1)

    def per_image(k, classes):
        pos_mask, neg_mask = subsample_labels(
            k, classes, s, conf.positive_fraction, bg_label=num_classes
        )
        sampled = pos_mask | neg_mask
        k2 = jax.random.fold_in(k, 1)
        # order: sampled-fg first, then sampled-bg, then padding — the mask
        # branch consumes the first conf.mask_rois slots (mostly fg)
        prio = (
            jax.random.uniform(k2, classes.shape)
            + sampled.astype(jnp.float32)
            + 2.0 * pos_mask.astype(jnp.float32)
        )
        _, idx = jax.lax.top_k(prio, s)
        return idx, jnp.take(sampled, idx), jnp.take(pos_mask, idx)

    keys = jax.random.split(key, gt_classes.shape[0])
    idx, valid, is_fg = jax.vmap(per_image)(keys, gt_classes)

    boxes = jnp.take_along_axis(proposals.boxes, idx[..., None], axis=1)
    classes = jnp.take_along_axis(gt_classes, idx, axis=1)
    classes = jnp.where(valid, classes, num_classes)  # inert slots → bg
    tgt_idx = jnp.take_along_axis(matched_idx, idx, axis=1)
    target_boxes = jnp.take_along_axis(gt.boxes, tgt_idx[..., None], axis=1)

    num_images = boxes.shape[0]
    metrics = {
        "roi_head/num_fg_samples": jnp.sum(is_fg & valid) / num_images,
        "roi_head/num_bg_samples": jnp.sum(valid & ~is_fg) / num_images,
    }
    sg = jax.lax.stop_gradient
    return (
        sg(boxes), sg(classes), sg(target_boxes), sg(is_fg & valid), sg(valid),
        sg(tgt_idx), metrics,
    )


def fast_rcnn_losses(
    conf: ROIConf,
    scores: Array,
    deltas: Array,
    sampled_boxes: Array,
    gt_classes: Array,
    target_boxes: Array,
    is_fg: Array,
    valid: Array,
) -> Dict[str, Array]:
    """Fast R-CNN losses (Detectron2 ``FastRCNNOutputLayers.losses`` contract —
    the part the reference never shipped, M3/M4).

    cls: softmax CE over C+1, averaged over sampled ROIs.
    box: smooth-l1 on the fg ROIs' own-class deltas, summed / total sampled.
    """
    num_sampled = jnp.maximum(jnp.sum(valid), 1.0)
    ce = softmax_cross_entropy(scores, jnp.clip(gt_classes, 0, conf.num_classes))
    loss_cls = jnp.sum(ce * valid) / num_sampled

    target_deltas = box_transform.get_deltas(
        sampled_boxes, target_boxes, conf.box2box_transform.weights
    )
    own = jnp.clip(gt_classes, 0, conf.num_classes - 1)
    own_idx = jnp.broadcast_to(own[..., None, None], own.shape + (1, 4))
    pred_fg_deltas = jnp.take_along_axis(deltas, own_idx, axis=-2)[..., 0, :]
    l1 = smooth_l1(pred_fg_deltas, target_deltas, conf.smooth_l1_beta)
    loss_box = jnp.sum(l1 * is_fg[..., None]) / num_sampled
    return {"loss_cls": loss_cls, "loss_box_reg": loss_box}


def fast_rcnn_inference(
    conf: ROIConf,
    scores: Array,
    deltas: Array,
    proposal_boxes: Array,
    proposal_valid: Array,
    image_sizes: Array,
) -> Detections:
    """Per-class decode → score gate → class-aware NMS → top detections.

    (Detectron2 ``fast_rcnn_inference`` contract; static-shaped: the dynamic
    score-threshold filter becomes a validity gate + top-K candidate cap.)

    Args:
      scores: ``(B, P, C+1)`` logits; deltas ``(B, P, C, 4)``;
      proposal_boxes ``(B, P, 4)``; image_sizes ``(B, 2)``.
    """
    probs = jax.nn.softmax(scores, axis=-1)[..., :-1]  # (B, P, C)
    b, p, c = probs.shape

    # select BEFORE decode (the same lever the RPN selection uses,
    # models/rpn.py): of the P·C (proposal, class) pairs only the top
    # pre_nms_candidates by gated probability ever get their deltas
    # decoded/clipped — the shipping form decoded all P·C boxes first
    # (~15k boxes/image at serving shapes) and gated on the results.
    # Semantic delta, dmAP-priced at ±0: a candidate whose box decodes
    # empty now *occupies* an (invalid) candidate slot instead of freeing
    # it for the next-best score; with k ≫ detections_per_image this never
    # changes the kept set in practice.
    gate = (probs > conf.score_thresh) & proposal_valid[..., None]
    flat_scores = jnp.where(
        gate.reshape(b, p * c), probs.reshape(b, p * c), -jnp.inf
    )
    k = min(conf.pre_nms_candidates, p * c)
    if conf.topk_impl == "approx" and k < p * c:
        cand_scores, cand_idx = jax.lax.approx_max_k(flat_scores, k)
    else:
        cand_scores, cand_idx = jax.lax.top_k(flat_scores, k)
    cand_classes = (cand_idx % c).astype(jnp.int32)
    if deltas.shape[2] != c:
        # ADVICE r4: the flat (B, P·C, 4) gather below hard-assumes
        # class-specific regression. Make the unsupported case
        # (cls_agnostic_bbox_reg, K=1) fail loudly instead of with a
        # shape error three lines down.
        raise ValueError(
            f"fast_rcnn_inference expects class-specific deltas (B,P,{c},4); "
            f"got K={deltas.shape[2]} (class-agnostic regression unsupported)"
        )
    cand_deltas = jnp.take_along_axis(
        deltas.reshape(b, p * c, 4), cand_idx[..., None], axis=1
    )  # (B, k, 4)
    cand_prop = jnp.take_along_axis(
        proposal_boxes, (cand_idx // c)[..., None], axis=1
    )  # (B, k, 4)
    cand_boxes = box_transform.apply_deltas(
        cand_deltas,
        cand_prop,
        conf.box2box_transform.weights,
        conf.box2box_transform.scale_clamp,
    )
    cand_boxes = box_ops.clip(cand_boxes, image_sizes[:, 0:1], image_sizes[:, 1:2])
    cand_valid = (cand_scores > -jnp.inf) & box_ops.nonempty(cand_boxes)

    db, ds, dc, ok = multiclass_nms(
        cand_boxes,
        cand_scores,
        cand_classes,
        conf.nms_thresh,
        conf.detections_per_image,
        cand_valid,
        impl=conf.nms_impl,
    )
    return Detections(boxes=db, scores=ds, classes=dc, valid=ok)


def pool_mask_features(
    conf: ROIConf,
    features: Dict[str, Array],
    feature_strides: Dict[str, int],
    boxes: Array,
) -> Array:
    """Multi-level ROIAlign at the mask head's resolution (14x14)."""
    feats = [features[f] for f in conf.in_features]
    strides = [feature_strides[f] for f in conf.in_features]
    p = conf.mask_pooler
    return _pool_with_impl(p, feats, strides, boxes)


def _pool_with_impl(p, feats, strides, boxes):
    """Shared impl dispatch for the mask/keypoint poolers (the 14×14 Pallas
    path reuses the generic packed window kernel; the gather path measured
    199 ms vs ~11 ms for 64×100 boxes at 640² serving shapes)."""
    if p.impl in ("pallas", "pallas_q8") and p.type == "ROIAlignV2":
        from detax.ops.roi_align_pallas import multiscale_roi_align_pallas

        return multiscale_roi_align_pallas(
            feats,
            boxes,
            strides,
            output_size=p.output_size,
            sampling_ratio=p.sampling_ratio,
            canonical_box_size=p.canonical_box_size,
            canonical_level=p.canonical_level,
            quantize=p.impl == "pallas_q8",
        )
    return multiscale_roi_align(
        feats,
        boxes,
        strides,
        output_size=p.output_size,
        sampling_ratio=p.sampling_ratio,
        aligned=p.type == "ROIAlignV2",
        canonical_box_size=p.canonical_box_size,
        canonical_level=p.canonical_level,
    )


def crop_gt_masks(
    gt_masks: Array,
    mask_stride: int,
    boxes: Array,
    gt_index: Array,
    out_hw: Tuple[int, int] = (28, 28),
) -> Array:
    """Crop each ROI's matched GT bitmap to the mask-target resolution.

    Args:
      gt_masks: ``(B, G, mh, mw)`` uint8 bitmaps in canvas coords at
        ``mask_stride``.
      boxes: ``(B, S, 4)`` sampled ROI boxes (canvas pixels).
      gt_index: ``(B, S)`` matched GT per ROI.

    Returns ``(B, S, oh, ow)`` float targets in [0, 1] (bilinear resample of
    the bitmap over the box, matching Mask R-CNN's target definition).
    """
    b, g, mh, mw = gt_masks.shape
    # one channel per GT instance; crop all, then select the matched one
    # (single-level call: every box clips to the one level provided)
    feats = jnp.moveaxis(gt_masks.astype(jnp.float32), 1, -1)  # (B, mh, mw, G)
    crops = multiscale_roi_align(
        [feats],
        boxes,
        [mask_stride],
        output_size=out_hw,
        sampling_ratio=1,
        aligned=True,
    )  # (B, S, oh, ow, G)
    # one-hot contraction over the GT axis (same ~40× TPU win as the
    # mask_inference class select — per-position 1-of-G lane gathers crawl)
    g = crops.shape[-1]
    onehot = jax.nn.one_hot(gt_index.astype(jnp.int32), g, dtype=crops.dtype)
    sel = jnp.einsum("bshwg,bsg->bshw", crops, onehot, preferred_element_type=jnp.float32)
    return jnp.clip(sel, 0.0, 1.0)


def mask_rcnn_loss(
    conf: ROIConf,
    mask_logits: Array,
    gt_masks: Array,
    mask_stride: int,
    boxes: Array,
    gt_index: Array,
    classes: Array,
    is_fg: Array,
) -> Array:
    """Mask BCE on foreground ROIs' own-class channel (Mask R-CNN recipe).

    mask_logits: ``(B, S, oh, ow, C)`` for the first ``mask_rois`` slots.
    """
    oh, ow = mask_logits.shape[2], mask_logits.shape[3]
    targets = crop_gt_masks(gt_masks, mask_stride, boxes, gt_index, (oh, ow))
    targets = jax.lax.stop_gradient(targets)
    own = jnp.clip(classes, 0, conf.num_classes - 1)
    # one-hot contraction (see mask_inference: the 1-of-C lane gather is
    # ~40× slower on TPU); loss in f32 on the own-class slice
    onehot = jax.nn.one_hot(own, conf.num_classes, dtype=mask_logits.dtype)
    logits = jnp.einsum(
        "bnhwc,bnc->bnhw", mask_logits, onehot, preferred_element_type=jnp.float32
    )
    from detax.ops.losses import bce_with_logits

    loss = bce_with_logits(logits, targets) * is_fg[:, :, None, None]
    denom = jnp.maximum(jnp.sum(is_fg) * oh * ow, 1.0)
    return jnp.sum(loss) / denom * conf.loss_mask_weight


def pool_keypoint_features(
    conf: ROIConf,
    features: Dict[str, Array],
    feature_strides: Dict[str, int],
    boxes: Array,
) -> Array:
    feats = [features[f] for f in conf.in_features]
    strides = [feature_strides[f] for f in conf.in_features]
    return _pool_with_impl(conf.keypoint_pooler, feats, strides, boxes)


def keypoint_rcnn_loss(
    conf: ROIConf,
    kp_logits: Array,
    gt_keypoints: Array,
    boxes: Array,
    gt_index: Array,
    is_fg: Array,
) -> Array:
    """Keypoint heatmap loss: CE over the flattened H*W softmax at each
    visible keypoint's cell (Keypoint R-CNN recipe).

    kp_logits: ``(B, S, H, W, K)``; gt_keypoints ``(B, G, K, 3)`` (x, y, v).
    """
    b, s, hh, ww, k = kp_logits.shape
    kp = jnp.take_along_axis(
        gt_keypoints, gt_index[:, :, None, None].astype(jnp.int32), axis=1
    )  # (B, S, K, 3)
    x1, y1 = boxes[..., 0:1], boxes[..., 1:2]
    w = jnp.maximum(boxes[..., 2:3] - x1, 1e-4)
    h = jnp.maximum(boxes[..., 3:4] - y1, 1e-4)
    cx = jnp.floor((kp[..., 0] - x1) * ww / w).astype(jnp.int32)
    cy = jnp.floor((kp[..., 1] - y1) * hh / h).astype(jnp.int32)
    inside = (cx >= 0) & (cx < ww) & (cy >= 0) & (cy < hh)
    visible = (kp[..., 2] > 0) & inside & is_fg[..., None]  # (B, S, K)
    target = jnp.clip(cy, 0, hh - 1) * ww + jnp.clip(cx, 0, ww - 1)  # (B, S, K)

    flat = kp_logits.reshape(b, s, hh * ww, k).swapaxes(-1, -2)  # (B, S, K, H*W)
    logp = jax.nn.log_softmax(flat, axis=-1)
    picked = jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(jnp.sum(visible), 1.0)
    return -jnp.sum(picked * visible) / denom * conf.loss_keypoint_weight


def keypoint_inference(kp_logits: Array, boxes: Array) -> Array:
    """Heatmap argmax → (x, y, score) per keypoint in canvas coords.

    kp_logits: ``(B, N, H, W, K)``; boxes ``(B, N, 4)`` → ``(B, N, K, 3)``.
    """
    b, n, hh, ww, k = kp_logits.shape
    flat = kp_logits.reshape(b, n, hh * ww, k)
    idx = jnp.argmax(flat, axis=2)  # (B, N, K)
    score = jnp.max(flat, axis=2)
    cy = (idx // ww).astype(jnp.float32) + 0.5
    cx = (idx % ww).astype(jnp.float32) + 0.5
    x1, y1 = boxes[..., 0:1], boxes[..., 1:2]
    w = boxes[..., 2:3] - x1
    h = boxes[..., 3:4] - y1
    x = x1 + cx * w / ww
    y = y1 + cy * h / hh
    return jnp.stack([x, y, score], axis=-1)


def mask_inference(mask_logits: Array, classes: Array, num_classes: int) -> Array:
    """Select each detection's own-class mask: ``(B, N, oh, ow, C)`` →
    ``(B, N, oh, ow)`` logits (caller applies sigmoid + pastes into boxes)."""
    own = jnp.clip(classes, 0, num_classes - 1)
    # one-hot contraction instead of take_along_axis: the per-position
    # 1-of-C lane gather measured 86.8 ms at serving shapes (64×100 dets,
    # 28², 80 classes) vs ~2 ms for the batched matvec — exact (0/1
    # weights, f32 accumulate) and f32 on the selected plane only
    onehot = jax.nn.one_hot(own, num_classes, dtype=mask_logits.dtype)  # (B, N, C)
    return jnp.einsum(
        "bnhwc,bnc->bnhw", mask_logits, onehot, preferred_element_type=jnp.float32
    )
