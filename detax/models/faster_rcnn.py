"""Faster R-CNN: the completed two-stage detector.

The reference's ``FasterRCNN`` is a stub (``python/src/models/rcnn.py:4-17``,
defect M1: typo'd backbone pick, ``roi_heads = ...``, no forward). detax
implements the full assembly as one Flax module whose inference and training
forwards each compile to a single XLA program:

  pixels → ResNet+FPN → RPN head → (anchors⊕deltas → proposals w/ NMS)
         → multi-level ROIAlign → box head → per-class decode → NMS

RNG: the training forward draws the anchor/proposal sampling keys from the
``sampling`` RNG stream (``self.make_rng``), keeping the module pure.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from detax.configs.detector import FasterRCNNConf
from detax.models.backbone import fpn_output_shapes
from detax.models.fpn import FPN
from detax.models.roi_heads import (
    StandardROIHeads,
    fast_rcnn_inference,
    fast_rcnn_losses,
    keypoint_inference,
    keypoint_rcnn_loss,
    label_and_sample_proposals,
    mask_inference,
    mask_rcnn_loss,
    pool_features,
    pool_keypoint_features,
    pool_mask_features,
)
from detax.models.rpn import (
    RegionProposalNetwork,
    label_and_sample_anchors,
    predict_proposals,
    rpn_anchors,
    rpn_losses,
)
from detax.structures.detections import Detections, GroundTruth
from detax.structures.image_batch import ImageBatch


class FasterRCNN(nn.Module):
    conf: FasterRCNNConf
    dtype: Optional[jnp.dtype] = None
    bn_axis_name: Optional[str] = None

    def setup(self):
        self.backbone = FPN(
            conf=self.conf.backbone, dtype=self.dtype, bn_axis_name=self.bn_axis_name
        )
        self.rpn = RegionProposalNetwork(conf=self.conf.rpn, dtype=self.dtype)
        self.roi = StandardROIHeads(conf=self.conf.roi, dtype=self.dtype)

    def _strides(self) -> Dict[str, int]:
        return {k: v.stride for k, v in fpn_output_shapes(self.conf.backbone).items()}

    def _rpn_forward(self, feats, train: bool):
        rconf = self.conf.rpn
        rpn_feats = [feats[f] for f in rconf.in_features]
        logits, deltas = self.rpn(rpn_feats)
        strides = self._strides()
        shapes = [f.shape[1:3] for f in rpn_feats]
        lvl_strides = [strides[f] for f in rconf.in_features]
        anchors = rpn_anchors(rconf, shapes, lvl_strides)
        return anchors, logits, deltas, shapes, lvl_strides

    def __call__(self, images: ImageBatch, train: bool = False) -> Detections:
        """Inference forward: batch of letterboxed images → final detections."""
        feats = self.backbone(images.pixels, train=train)
        anchors, logits, deltas, shapes, lvl_strides = self._rpn_forward(feats, train)
        proposals = predict_proposals(
            self.conf.rpn, anchors, logits, deltas, images.image_sizes, train=False,
            feature_shapes=shapes, strides=lvl_strides,
        )
        pooled = pool_features(self.conf.roi, feats, self._strides(), proposals.boxes)
        scores, box_deltas = self.roi(pooled, train=False)
        dets = fast_rcnn_inference(
            self.conf.roi, scores, box_deltas, proposals.boxes, proposals.valid, images.image_sizes
        )
        masks = None
        keypoints = None
        if self.conf.roi.mask_on:
            mp = pool_mask_features(self.conf.roi, feats, self._strides(), dets.boxes)
            mlogits = self.roi.mask_forward(mp, train=False)
            masks = mask_inference(mlogits, dets.classes, self.conf.roi.num_classes)
        if self.conf.roi.keypoint_on:
            kp = pool_keypoint_features(self.conf.roi, feats, self._strides(), dets.boxes)
            klogits = self.roi.keypoint_forward(kp, train=False)
            keypoints = keypoint_inference(klogits, dets.boxes)
        if masks is not None or keypoints is not None:
            dets = Detections(
                boxes=dets.boxes, scores=dets.scores, classes=dets.classes,
                valid=dets.valid, mask_logits=masks, keypoints=keypoints,
            )
        return dets

    def propose(self, images: ImageBatch) -> Detections:
        """RPN-only forward (the reference's deepest working path, §3.3)."""
        feats = self.backbone(images.pixels, train=False)
        anchors, logits, deltas, shapes, lvl_strides = self._rpn_forward(feats, False)
        return predict_proposals(
            self.conf.rpn, anchors, logits, deltas, images.image_sizes, train=False,
            feature_shapes=shapes, strides=lvl_strides,
        )

    def train_forward(
        self, images: ImageBatch, gt: GroundTruth
    ) -> Tuple[Dict[str, Array], Dict[str, Array]]:
        """Training forward: returns (losses, metrics) dicts.

        Loss keys follow Detectron2/reference naming: ``loss_rpn_cls``,
        ``loss_rpn_loc``, ``loss_cls``, ``loss_box_reg``; metrics carry the
        reference's ``Logs`` scalar names (``rpn.py:218-220``,
        ``roi.py:189-191``).
        """
        key = self.make_rng("sampling")
        k_anchor, k_roi = jax.random.split(key)

        feats = self.backbone(images.pixels, train=True)
        anchors, logits, deltas, shapes, lvl_strides = self._rpn_forward(feats, True)

        anchors_cat = jnp.concatenate(anchors, axis=0)
        # losses in f32 (the head keeps its outputs in the compute dtype)
        logits_cat = jnp.concatenate(logits, axis=1).astype(jnp.float32)
        deltas_cat = jnp.concatenate(deltas, axis=1).astype(jnp.float32)

        gt_labels, matched_boxes = label_and_sample_anchors(
            k_anchor, self.conf.rpn, anchors_cat, gt, images.image_sizes
        )
        rpn_loss, rpn_metrics = rpn_losses(
            self.conf.rpn, anchors_cat, logits_cat, deltas_cat, gt_labels, matched_boxes
        )

        proposals = predict_proposals(
            self.conf.rpn,
            anchors,
            [jax.lax.stop_gradient(l) for l in logits],
            [jax.lax.stop_gradient(d) for d in deltas],
            images.image_sizes,
            train=True,
            feature_shapes=shapes,
            strides=lvl_strides,
        )
        boxes, classes, tboxes, is_fg, valid, gt_idx, roi_metrics = label_and_sample_proposals(
            k_roi, self.conf.roi, proposals, gt
        )
        # TRAINING pools through the SAME pooler that serves: the Pallas
        # kernel carries a custom VJP (kernel forward, gather-path backward
        # at the kernel's window-fitting level assignment — see
        # multiscale_roi_align_pallas), so the net you train IS the net you
        # serve (closes the round-3 train/serve pooler skew).
        roi_train = self.conf.roi
        pooled = pool_features(roi_train, feats, self._strides(), boxes)
        scores, box_deltas = self.roi(pooled, train=True)
        roi_loss = fast_rcnn_losses(
            self.conf.roi, scores, box_deltas, boxes, classes, tboxes, is_fg, valid
        )

        losses = {**rpn_loss, **roi_loss}
        if self.conf.roi.mask_on and gt.masks is not None:
            # mask branch on the first mask_rois slots (sampling is fg-first)
            k = self.conf.roi.mask_rois
            mboxes = boxes[:, :k]
            mp = pool_mask_features(roi_train, feats, self._strides(), mboxes)
            mlogits = self.roi.mask_forward(mp, train=True)
            losses["loss_mask"] = mask_rcnn_loss(
                self.conf.roi,
                mlogits,
                gt.masks,
                self.conf.preprocess.mask_stride,
                mboxes,
                gt_idx[:, :k],
                classes[:, :k],
                is_fg[:, :k],
            )
        if self.conf.roi.keypoint_on and gt.keypoints is not None:
            kk = self.conf.roi.keypoint_rois
            kboxes = boxes[:, :kk]
            kp = pool_keypoint_features(roi_train, feats, self._strides(), kboxes)
            klogits = self.roi.keypoint_forward(kp, train=True)
            losses["loss_keypoint"] = keypoint_rcnn_loss(
                self.conf.roi, klogits, gt.keypoints, kboxes, gt_idx[:, :kk], is_fg[:, :kk]
            )
        metrics = {**rpn_metrics, **roi_metrics}
        return losses, metrics
