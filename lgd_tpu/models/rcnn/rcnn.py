"""Generalized R-CNN student (Faster/Mask R-CNN) + its LGD distillator.

Equivalents of the reference RCNNCT (models/customized_detectors/frcnn.py:
24-118; decomposed forward returning losses + raw/fpn features, a ``predict``
that re-runs RPN + ROI heads on substituted teacher features, and an
``inference(..., features=...)`` accepting teacher features) and
DistillatorGeneralizedRCNN (models/distillator.py:117-198).

TPU shape: proposals are fixed (B, POST_NMS_TOPK) slabs; ROI sampling uses
the 'sampling' rng stream; the teacher pass runs the full RPN + ROI pipeline
on the teacher feature pyramid with fresh proposals, like the reference's
student.predict(features_tea, images, gt, inputs) (frcnn.py:59-76).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...structures import BatchedInstances
from ..backbones.fpn import FPN
from ..backbones.resnet import build_resnet
from .roi_heads import (
    StandardROIHeads,
    fast_rcnn_inference,
    fast_rcnn_losses,
    label_and_sample_proposals,
    mask_rcnn_loss,
)
from .rpn import RPN, generate_proposals, label_rpn_anchors, rpn_anchors, rpn_losses


class RCNNCT(nn.Module):
    """Decomposed Generalized R-CNN student."""

    cfg: Any
    dtype: Any = jnp.bfloat16

    def setup(self):
        cfg = self.cfg
        backbone_name = cfg.MODEL.BACKBONE.NAME
        # FPN-less trunks: Base-RCNN-C4 (res4 + Res5ROIHeads) and
        # Base-RCNN-DilatedC5 (dilated res5 + StandardROIHeads) run the
        # heads directly on raw ResNet stages (detectron2
        # build_resnet_backbone path)
        self.use_fpn = "fpn" in backbone_name
        if "swint" in backbone_name:
            from ..backbones.swin import build_swint

            self.bottom_up = build_swint(cfg, dtype=self.dtype)
            in_feats = tuple(cfg.MODEL.FPN.IN_FEATURES)
            in_strides = [{"stage2": 4, "stage3": 8, "stage4": 16,
                           "stage5": 32}[f] for f in in_feats]
        else:
            self.bottom_up = build_resnet(cfg, dtype=self.dtype)
            in_feats = tuple(cfg.MODEL.FPN.IN_FEATURES)
            in_strides = [{"res2": 4, "res3": 8, "res4": 16, "res5": 32}[f]
                          for f in in_feats]
        if self.use_fpn:
            self.fpn = FPN(in_features=in_feats, in_strides=in_strides,
                           out_channels=cfg.MODEL.FPN.OUT_CHANNELS,
                           top_block="maxpool", dtype=self.dtype, name="fpn")
        self.proposal_generator = RPN(cfg=cfg, dtype=self.dtype, name="rpn")
        if cfg.MODEL.ROI_HEADS.NAME == "Res5ROIHeads":
            from .roi_heads import Res5ROIHeads

            self.roi_heads = Res5ROIHeads(cfg=cfg, dtype=self.dtype,
                                          name="roi_heads")
        else:
            self.roi_heads = StandardROIHeads(cfg=cfg, dtype=self.dtype,
                                              name="roi_heads")
        self.pixel_mean = tuple(cfg.MODEL.PIXEL_MEAN)
        self.pixel_std = tuple(cfg.MODEL.PIXEL_STD)
        self.mask_on = cfg.MODEL.MASK_ON

    def normalize(self, images, image_sizes):
        mean = jnp.asarray(self.pixel_mean, images.dtype)
        std = jnp.asarray(self.pixel_std, images.dtype)
        x = (images - mean) / std
        B, H, W, _ = x.shape
        yy = jax.lax.broadcasted_iota(jnp.int32, (1, H, W, 1), 1)
        xx = jax.lax.broadcasted_iota(jnp.int32, (1, H, W, 1), 2)
        mask = (yy < image_sizes[:, 0, None, None, None]) & (
            xx < image_sizes[:, 1, None, None, None])
        return jnp.where(mask, x, 0.0)

    def __call__(self, images, image_sizes, train: bool = False):
        # train=True enables backbone stochastic depth (Swin drop-path)
        x = self.normalize(images, image_sizes).astype(self.dtype)
        raw = self.bottom_up(x, deterministic=not train)
        feats = self.fpn(raw) if self.use_fpn else dict(raw)
        return raw, feats

    def _padded_hw(self, feats):
        """Recover the padded canvas from the first RPN level's grid."""
        from ..layers import feature_strides

        f0 = self.proposal_generator.in_features[0]
        stride0 = feature_strides(self.cfg, [f0])[0]
        g = feats[f0]
        return (g.shape[1] * stride0, g.shape[2] * stride0)

    def predict(self, feats: Dict[str, jax.Array], image_sizes,
                gt: BatchedInstances):
        """Full RPN + ROI training pass on the given feature pyramid,
        returning the loss dict (reference frcnn.py:59-76)."""
        cfg = self.cfg
        padded_hw = self._padded_hw(feats)

        anchors, counts = rpn_anchors(cfg, padded_hw,
                                      self.proposal_generator.in_features)
        logits, deltas = self.proposal_generator(feats)
        gt_labels, matched = label_rpn_anchors(cfg, anchors, gt)
        rng = self.make_rng("sampling")
        r1, r2 = jax.random.split(rng)
        losses = rpn_losses(cfg, logits, deltas, gt_labels, matched,
                            anchors, r1)
        prop_boxes, prop_scores, prop_valid = generate_proposals(
            cfg, jax.lax.stop_gradient(logits), jax.lax.stop_gradient(deltas),
            anchors, counts, image_sizes, training=True)

        sampled = label_and_sample_proposals(
            cfg, prop_boxes, prop_valid, gt, r2)
        scores, box_deltas = self.roi_heads.box_forward(
            feats, sampled["boxes"], sampled["valid"])
        losses.update(fast_rcnn_losses(cfg, scores, box_deltas, sampled, gt))
        if self.mask_on and (gt.mask_crops is not None
                             or gt.bitmasks is not None):
            from .roi_heads import take_fg_subset

            k = max(int(cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE
                        * cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION), 1)
            sub = take_fg_subset(sampled, k)
            mask_logits = self.roi_heads.mask_forward(
                feats, sub["boxes"], sub["is_fg"])
            losses["loss_mask"] = mask_rcnn_loss(cfg, mask_logits, sub, gt)
        return losses

    def infer_boxes(self, feats, image_sizes):
        cfg = self.cfg
        padded_hw = self._padded_hw(feats)
        anchors, counts = rpn_anchors(cfg, padded_hw,
                                      self.proposal_generator.in_features)
        logits, deltas = self.proposal_generator(feats)
        prop_boxes, prop_scores, prop_valid = generate_proposals(
            cfg, logits, deltas, anchors, counts, image_sizes, training=False)
        scores, box_deltas = self.roi_heads.box_forward(
            feats, prop_boxes, prop_valid)
        dets = fast_rcnn_inference(cfg, scores, box_deltas, prop_boxes,
                                   prop_valid, image_sizes)
        mask_probs = None
        if self.mask_on:
            mask_logits = self.roi_heads.mask_forward(
                feats, dets.boxes, dets.valid)
            cls = jnp.clip(dets.classes, 0,
                           cfg.MODEL.ROI_HEADS.NUM_CLASSES - 1)
            per_cls = jnp.take_along_axis(
                mask_logits, cls[..., None, None, None], axis=-1)[..., 0]
            mask_probs = jax.nn.sigmoid(per_cls)
        return dets, mask_probs

    def init_all(self, images, image_sizes, gt):
        raw, feats = self(images, image_sizes)
        return self.predict(feats, image_sizes, gt)
