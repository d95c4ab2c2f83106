"""RetinaNet: single-stage focal-loss detector (BASELINE config 3).

No reference analog (the reference is Faster R-CNN only); the contract is the
standard one: ResNet-50+FPN, shared cls/box towers, focal loss over all
anchors, per-level top-K candidate selection, class-aware NMS. Reuses the
framework's anchor/matcher/transform/NMS primitives — the point of detax's
pure-ops design.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from detax.configs.retinanet import RetinaNetConf
from detax.models.backbone import fpn_output_shapes
from detax.models.fpn import FPN
from detax.nn.anchors import grid_anchors, num_cell_anchors
from detax.nn.retina_head import RetinaNetHead
from detax.ops import box_transform
from detax.ops.losses import sigmoid_focal_loss, smooth_l1
from detax.ops.matcher import match
from detax.ops.nms import multiclass_nms
from detax.structures import boxes as box_ops
from detax.structures.detections import Detections, GroundTruth
from detax.structures.image_batch import ImageBatch


class RetinaNet(nn.Module):
    conf: RetinaNetConf
    dtype: Optional[jnp.dtype] = None
    bn_axis_name: Optional[str] = None

    def setup(self):
        c = self.conf
        num_anchors = num_cell_anchors(
            c.anchor_generator.sizes, c.anchor_generator.aspect_ratios, len(c.in_features)
        )
        assert len(set(num_anchors)) == 1, "RetinaNet shares the head across levels"
        self.backbone = FPN(conf=c.backbone, dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        self.head = RetinaNetHead(
            num_classes=c.num_classes,
            num_anchors=num_anchors[0],
            num_convs=c.head.num_convs,
            prior_prob=c.head.prior_prob,
            quant=c.head.quant,
            dtype=self.dtype,
        )

    def _forward_raw(self, images: ImageBatch, train: bool):
        c = self.conf
        feats = self.backbone(images.pixels, train=train)
        level_feats = [feats[f] for f in c.in_features]
        logits, deltas = self.head(level_feats)
        strides = {k: v.stride for k, v in fpn_output_shapes(c.backbone).items()}
        anchors = grid_anchors(
            [f.shape[1:3] for f in level_feats],
            [strides[f] for f in c.in_features],
            c.anchor_generator.sizes,
            c.anchor_generator.aspect_ratios,
            c.anchor_generator.offset,
        )
        return anchors, logits, deltas

    def __call__(self, images: ImageBatch, train: bool = False) -> Detections:
        """Inference: per-level top-K candidates → decode → class-aware NMS."""
        c = self.conf
        anchors, logits, deltas = self._forward_raw(images, train)

        cand_boxes, cand_scores, cand_classes = [], [], []
        for anch, lg, dl in zip(anchors, logits, deltas):
            b, r, nc = lg.shape
            if c.topk_impl == "anchor":
                # anchor-first selection: per-anchor best class, then top-k
                # over ANCHORS (r columns instead of r·nc — 11x cheaper at
                # stride 8, measured). Documented deviation: at most one
                # class candidate per anchor (Detectron2's flat top-k can
                # emit several); class-aware NMS keeps the top class in the
                # overwhelmingly common case anyway. Serving-profile option.
                best = jnp.max(lg, axis=-1)  # (B, R)
                cls_all = jnp.argmax(lg, axis=-1).astype(jnp.int32)
                k = min(c.topk_candidates, r)
                if k < r:
                    sel, anchor_idx = jax.lax.approx_max_k(best, k, recall_target=c.topk_recall)
                else:
                    sel, anchor_idx = jax.lax.top_k(best, k)
                cls_idx = jnp.take_along_axis(cls_all, anchor_idx, axis=1)
            elif c.topk_impl == "two_stage":
                # candidate-set-faithful fast path: top-k ANCHORS by their
                # per-anchor best class, then flat top-k over those anchors'
                # full class rows. With exact stage selections this equals
                # the flat top-k set: if (a, c) ranks in the flat top-k,
                # fewer than k anchors have best-score above a's, so a
                # survives stage 1 (proof in tests/test_models.py::
                # test_retinanet_two_stage_matches_flat). approx stage ops
                # only drop near-tail rows (recall_target, as elsewhere).
                best = jnp.max(lg, axis=-1)  # (B, R)
                k_a = min(c.topk_candidates, r)
                if k_a < r:
                    _, a_top = jax.lax.approx_max_k(best, k_a, recall_target=c.topk_recall)
                else:
                    _, a_top = jax.lax.top_k(best, k_a)
                sub = jnp.take_along_axis(lg, a_top[..., None], axis=1)  # (B, kA, nc)
                flat = sub.reshape(b, k_a * nc)
                k = min(c.topk_candidates, k_a * nc)
                if k < k_a * nc:
                    sel, f_idx = jax.lax.approx_max_k(flat, k, recall_target=c.topk_recall)
                else:
                    sel, f_idx = jax.lax.top_k(flat, k)
                anchor_idx = jnp.take_along_axis(a_top, f_idx // nc, axis=1)
                cls_idx = (f_idx % nc).astype(jnp.int32)
            else:
                # select on raw logits (sigmoid is monotonic → identical
                # order, and the 1.55M-column sigmoid at stride 8 is
                # skipped), apply sigmoid to the k winners only
                flat = lg.reshape(b, r * nc)
                k = min(c.topk_candidates, r * nc)
                if c.topk_impl == "approx" and k < r * nc:
                    sel, flat_idx = jax.lax.approx_max_k(flat, k, recall_target=c.topk_recall)
                else:
                    sel, flat_idx = jax.lax.top_k(flat, k)
                anchor_idx = flat_idx // nc
                cls_idx = (flat_idx % nc).astype(jnp.int32)
            sc = jax.nn.sigmoid(sel.astype(jnp.float32))  # tiny (B, k) slice
            sel_deltas = jnp.take_along_axis(dl, anchor_idx[..., None], axis=1)
            sel_anchors = jnp.take(anch, anchor_idx, axis=0)
            bx = box_transform.apply_deltas(
                sel_deltas, sel_anchors, c.box2box_transform.weights, c.box2box_transform.scale_clamp
            )
            cand_boxes.append(bx)
            cand_scores.append(sc)
            cand_classes.append(cls_idx)

        boxes = jnp.concatenate(cand_boxes, axis=1)
        scores = jnp.concatenate(cand_scores, axis=1)
        classes = jnp.concatenate(cand_classes, axis=1)
        boxes = box_ops.clip(boxes, images.image_sizes[:, 0:1], images.image_sizes[:, 1:2])
        valid = (scores > c.score_thresh) & box_ops.nonempty(boxes)

        total = boxes.shape[1]
        if c.final_nms_candidates and c.final_nms_candidates < total:
            # cap the final-NMS pool (ΔmAP-priced serving lever): replaces
            # the (B, Σ levels·k) argsort + gathers with one top-k
            k = c.final_nms_candidates
            gated = jnp.where(valid, scores, -jnp.inf)
            # EXACT top_k: the pool is only ~5k columns (cheap), and
            # approx_max_k's recall_target here measured a real -0.006 mAP
            # (it drops near-tail candidates the final NMS still needs)
            cs, ci = jax.lax.top_k(gated, k)
            boxes = jnp.take_along_axis(boxes, ci[..., None], axis=1)
            classes = jnp.take_along_axis(classes, ci, axis=1)
            scores = cs
            valid = scores > -jnp.inf

        db, ds, dc, ok = multiclass_nms(
            boxes, scores, classes, c.nms_thresh, c.detections_per_image, valid,
            impl=c.nms_impl,
        )
        return Detections(boxes=db, scores=ds, classes=dc, valid=ok)

    def train_forward(
        self, images: ImageBatch, gt: GroundTruth
    ) -> Tuple[Dict[str, Array], Dict[str, Array]]:
        """Focal cls loss over all non-ignored anchors + smooth-l1 on fg,
        both normalized by the fg count (standard RetinaNet recipe)."""
        c = self.conf
        m = c.anchor_matcher
        anchors, logits, deltas = self._forward_raw(images, True)
        anchors_cat = jnp.concatenate(anchors, axis=0)  # (R, 4)
        # losses in f32 (the head keeps its outputs in the compute dtype)
        logits_cat = jnp.concatenate(logits, axis=1).astype(jnp.float32)  # (B, R, C)
        deltas_cat = jnp.concatenate(deltas, axis=1).astype(jnp.float32)  # (B, R, 4)

        iou = box_ops.pairwise_iou(gt.boxes, anchors_cat[None])  # (B, G, R)
        matched_idx, labels = jax.vmap(
            lambda q, v: match(q, v, m.iou_thresholds, m.iou_labels, m.allow_low_quality_matches)
        )(iou, gt.valid)
        labels = jax.lax.stop_gradient(labels)
        matched_idx = jax.lax.stop_gradient(matched_idx)

        fg = labels == 1
        valid = labels >= 0
        gt_cls = jnp.take_along_axis(gt.classes, matched_idx, axis=1)  # (B, R)
        onehot = jax.nn.one_hot(gt_cls, c.num_classes, dtype=jnp.float32) * fg[..., None]

        num_fg = jnp.maximum(jnp.sum(fg), 1.0)
        cls_loss = sigmoid_focal_loss(logits_cat, onehot, c.focal_loss_alpha, c.focal_loss_gamma)
        loss_cls = jnp.sum(cls_loss * valid[..., None]) / num_fg

        matched_boxes = jnp.take_along_axis(gt.boxes, matched_idx[..., None], axis=1)
        tgt = box_transform.get_deltas(anchors_cat[None], matched_boxes, c.box2box_transform.weights)
        loss_box = jnp.sum(smooth_l1(deltas_cat, tgt, c.smooth_l1_beta) * fg[..., None]) / num_fg

        metrics = {
            "retinanet/num_fg_anchors": jnp.sum(fg) / logits_cat.shape[0],
        }
        return {"loss_cls": loss_cls, "loss_box_reg": loss_box}, metrics
