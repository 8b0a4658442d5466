"""RetinaNet student (Flax; decomposed API mirroring the reference).

Re-implements the behavior of detectron2 ``RetinaNet`` as customized by the
reference's ``RetinaNetCT`` (models/customized_detectors/retinanet.py:24-95):
backbone and FPN split apart, a ``predict`` API producing (anchors, logits,
deltas), losses with the EMA loss normalizer, and top-k -> score-filter ->
class-aware-NMS inference. TPU deltas: ragged per-image ``Instances`` become
padded ``BatchedInstances``; anchors are numpy constants; per-image GT
assignment runs under ``lax.map`` to bound the (M, R) IoU workspace (3.6x
faster than the materialized (B, M, R) vmap form — measured on-chip); the
loss normalizer EMA is threaded explicitly through the train state instead
of a module buffer (SURVEY.md §7 hard part: DP-invariant normalizers — here
it is computed on the *global* batch, so it is identical for any device
count, unlike the reference's per-process EMA whose expectation it matches).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops import losses as L
from ...ops.matcher import Matcher
from ...ops.nms import batched_nms_mask, topk_detections
from ...ops.topk import topk_flat_pairs
from ...structures import Box2BoxTransform, BatchedDetections, BatchedInstances
from ...structures import boxes as box_ops
from ..backbones.fpn import FPN
from ..backbones.resnet import build_resnet
from ..layers import normal_init, constant_init
from .anchors import AnchorGenerator, feature_grid_sizes


class RetinaNetHead(nn.Module):
    """Shared cls/reg towers over all levels (detectron2 RetinaNetHead)."""

    num_classes: int = 80
    num_anchors: int = 9
    num_convs: int = 4
    prior_prob: float = 0.01
    channels: int = 256
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, features: List[jax.Array]):
        conv_kw = dict(
            kernel_size=(3, 3), padding="SAME", dtype=self.dtype,
            kernel_init=normal_init(0.01), bias_init=nn.initializers.zeros,
        )
        cls_convs = [
            nn.Conv(self.channels, name=f"cls_subnet_{i}", **conv_kw)
            for i in range(self.num_convs)
        ]
        box_convs = [
            nn.Conv(self.channels, name=f"bbox_subnet_{i}", **conv_kw)
            for i in range(self.num_convs)
        ]
        bias_value = -math.log((1 - self.prior_prob) / self.prior_prob)
        cls_score = nn.Conv(
            self.num_anchors * self.num_classes, name="cls_score",
            kernel_size=(3, 3), padding="SAME", dtype=self.dtype,
            kernel_init=normal_init(0.01), bias_init=constant_init(bias_value),
        )
        bbox_pred = nn.Conv(
            self.num_anchors * 4, name="bbox_pred", **conv_kw
        )

        logits, deltas = [], []
        for f in features:
            c = f
            for conv in cls_convs:
                c = nn.relu(conv(c))
            b = f
            for conv in box_convs:
                b = nn.relu(conv(b))
            logits.append(cls_score(c))
            deltas.append(bbox_pred(b))
        return logits, deltas


class RetinaNetCT(nn.Module):
    """Student detector: feature extraction + predict, decomposed like the
    reference RetinaNetCT so the distillator can re-drive the head with
    teacher features (distillator.py:107-111)."""

    cfg: Any
    dtype: Any = jnp.bfloat16

    def setup(self):
        cfg = self.cfg
        self.in_features = tuple(cfg.MODEL.RETINANET.IN_FEATURES)
        self.num_classes = cfg.MODEL.RETINANET.NUM_CLASSES
        backbone_name = cfg.MODEL.BACKBONE.NAME
        if "swint" in backbone_name:
            from ..backbones.swin import build_swint

            self.bottom_up = build_swint(cfg, dtype=self.dtype)
            in_feats = tuple(cfg.MODEL.FPN.IN_FEATURES)
            in_strides = [{"stage2": 4, "stage3": 8, "stage4": 16,
                           "stage5": 32}[f] for f in in_feats]
            top_in = "p5"
        else:
            self.bottom_up = build_resnet(cfg, dtype=self.dtype)
            in_feats = tuple(cfg.MODEL.FPN.IN_FEATURES)
            in_strides = [{"res2": 4, "res3": 8, "res4": 16, "res5": 32}[f]
                          for f in in_feats]
            top_in = "res5"
        self.fpn = FPN(
            in_features=in_feats,
            in_strides=in_strides,
            out_channels=cfg.MODEL.FPN.OUT_CHANNELS,
            top_block="p6p7",
            top_block_in_feature=top_in,
            dtype=self.dtype,
            name="fpn",
        )
        num_anchors = (
            len(cfg.MODEL.ANCHOR_GENERATOR.SIZES[0])
            * len(cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS[0])
        )
        self.head = RetinaNetHead(
            num_classes=self.num_classes,
            num_anchors=num_anchors,
            num_convs=cfg.MODEL.RETINANET.NUM_CONVS,
            prior_prob=cfg.MODEL.RETINANET.PRIOR_PROB,
            channels=cfg.MODEL.FPN.OUT_CHANNELS,
            dtype=self.dtype,
            name="head",
        )
        self.pixel_mean = tuple(cfg.MODEL.PIXEL_MEAN)
        self.pixel_std = tuple(cfg.MODEL.PIXEL_STD)

    def normalize(self, images, image_sizes):
        """(x - mean) / std, then re-zero the padded region so padding is
        exactly 0 post-normalization (detectron2 pads after normalizing)."""
        mean = jnp.asarray(self.pixel_mean, images.dtype)
        std = jnp.asarray(self.pixel_std, images.dtype)
        x = (images - mean) / std
        B, H, W, _ = x.shape
        yy = jax.lax.broadcasted_iota(jnp.int32, (1, H, W, 1), 1)
        xx = jax.lax.broadcasted_iota(jnp.int32, (1, H, W, 1), 2)
        mask = (yy < image_sizes[:, 0, None, None, None]) & (
            xx < image_sizes[:, 1, None, None, None]
        )
        return jnp.where(mask, x, 0.0)

    def __call__(self, images, image_sizes, train: bool = False):
        """-> (raw_features dict, fpn features dict). ``train`` enables the
        backbone's stochastic regularizers (Swin drop-path; the reference
        trains Swin-T with drop_path_rate=0.2, swin_transformer.py:167,388)."""
        x = self.normalize(images, image_sizes).astype(self.dtype)
        raw = self.bottom_up(x, deterministic=not train)
        feats = self.fpn(raw)
        return raw, feats

    def init_all(self, images, image_sizes):
        """Init helper touching every submodule (backbone+fpn+head)."""
        raw, feats = self(images, image_sizes)
        return self.predict([feats[f] for f in self.in_features])

    def predict(self, features: List[jax.Array]):
        """features: per-level list -> (logits (B, R, K), deltas (B, R, 4))
        flattened and concatenated over levels in HWA order (the reference's
        permute_to_N_HWA_K layout, retinanet.py:13-22)."""
        logits, deltas = self.head(features)
        B = features[0].shape[0]
        logits = jnp.concatenate(
            [l.reshape(B, -1, self.num_classes) for l in logits], axis=1
        )
        deltas = jnp.concatenate([d.reshape(B, -1, 4) for d in deltas], axis=1)
        return logits.astype(jnp.float32), deltas.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Pure functions: anchors / GT assignment / losses / inference
# ---------------------------------------------------------------------------


def build_anchors(cfg, padded_hw) -> Tuple[np.ndarray, List[int]]:
    """(R, 4) anchors over all levels for a fixed padded canvas."""
    strides = [
        {"p2": 4, "p3": 8, "p4": 16, "p5": 32, "p6": 64, "p7": 128}[f]
        for f in cfg.MODEL.RETINANET.IN_FEATURES
    ]
    gen = AnchorGenerator(
        sizes=cfg.MODEL.ANCHOR_GENERATOR.SIZES,
        aspect_ratios=cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS,
        strides=strides,
        offset=cfg.MODEL.ANCHOR_GENERATOR.OFFSET,
    )
    grid_sizes = feature_grid_sizes(padded_hw, strides)
    per_level = gen(grid_sizes)
    counts = [len(a) for a in per_level]
    return np.concatenate(per_level, axis=0), counts


def label_anchors(cfg, anchors, gt: BatchedInstances):
    """detectron2 RetinaNet.label_anchors: per-image matcher with low-quality
    promotion. anchors: (R, 4). Returns gt_labels (B, R) int32 (num_classes
    = background, -1 = ignore) and matched gt boxes (B, R, 4)."""
    matcher = Matcher(
        cfg.MODEL.RETINANET.IOU_THRESHOLDS,
        cfg.MODEL.RETINANET.IOU_LABELS,
        allow_low_quality_matches=True,
    )
    num_classes = cfg.MODEL.RETINANET.NUM_CLASSES
    anchors = jnp.asarray(anchors)

    def per_image(args):
        boxes, classes, valid = args
        iou = box_ops.pairwise_iou(boxes, anchors)  # (M, R)
        matches, match_labels = matcher(iou, valid)
        gt_labels_i = jnp.where(
            match_labels == 1,
            classes[matches],
            jnp.where(match_labels == -1, -1, num_classes),
        )
        matched_boxes_i = boxes[matches]
        return gt_labels_i.astype(jnp.int32), matched_boxes_i

    # lax.map: one (M, R) IoU slab at a time. Measured on the v5e chip
    # (batch 16, R=103k, M=32): 5.4 ms/step vs 19.3 ms for the vmap
    # formulation — the full (B, M, R) f32 workspace (~210 MB per
    # intermediate) turns an arithmetic-trivial op into pure HBM traffic.
    return jax.lax.map(per_image, (gt.boxes, gt.classes, gt.valid))


def retinanet_losses(cfg, pred_logits, pred_deltas, gt_labels, gt_boxes,
                     anchors, loss_normalizer):
    """detectron2 RetinaNet.losses with the EMA normalizer threaded through.

    pred_logits: (B, R, K); pred_deltas: (B, R, 4); gt_labels: (B, R);
    gt_boxes: (B, R, 4) matched boxes; anchors (R, 4); loss_normalizer:
    scalar EMA state. Returns (losses dict, new_normalizer).
    """
    num_classes = cfg.MODEL.RETINANET.NUM_CLASSES
    transform = Box2BoxTransform(tuple(cfg.MODEL.RETINANET.BBOX_REG_WEIGHTS))
    anchors = jnp.asarray(anchors)

    valid_mask = gt_labels >= 0
    pos_mask = (gt_labels >= 0) & (gt_labels != num_classes)
    num_pos = jnp.sum(pos_mask.astype(jnp.float32))

    momentum = 0.9
    new_normalizer = momentum * loss_normalizer + (1.0 - momentum) * jnp.maximum(
        num_pos, 1.0
    )

    # one-hot targets excluding the background class
    labels_clipped = jnp.clip(gt_labels, 0, num_classes - 1)
    onehot = jax.nn.one_hot(labels_clipped, num_classes, dtype=pred_logits.dtype)
    onehot = onehot * pos_mask[..., None].astype(pred_logits.dtype)

    cls_loss = L.sigmoid_focal_loss(
        pred_logits, onehot,
        alpha=cfg.MODEL.RETINANET.FOCAL_LOSS_ALPHA,
        gamma=cfg.MODEL.RETINANET.FOCAL_LOSS_GAMMA,
    )
    loss_cls = jnp.sum(cls_loss * valid_mask[..., None].astype(cls_loss.dtype))

    gt_deltas = transform.get_deltas(anchors[None], gt_boxes)
    reg_loss = L.smooth_l1_loss(
        pred_deltas, gt_deltas, cfg.MODEL.RETINANET.SMOOTH_L1_LOSS_BETA
    )
    loss_box_reg = jnp.sum(reg_loss * pos_mask[..., None].astype(reg_loss.dtype))

    return (
        {
            "loss_cls": loss_cls / new_normalizer,
            "loss_box_reg": loss_box_reg / new_normalizer,
        },
        new_normalizer,
    )


def retinanet_inference(cfg, pred_logits, pred_deltas, anchors, level_counts,
                        image_sizes) -> BatchedDetections:
    """Top-k per level -> score filter -> decode -> class-aware NMS -> top
    DETECTIONS_PER_IMAGE (detectron2 RetinaNet.inference semantics on padded
    static shapes).

    The candidate-selection stage runs batched (no per-image vmap) so XLA
    sees one (B, Ri*K) top_k per level, and ranks by raw logits (sigmoid is
    monotone) so only the k selected scores are ever exponentiated. Decoding
    then touches k=1000 anchors per level instead of all Ri."""
    topk_cand = cfg.MODEL.RETINANET.TOPK_CANDIDATES_TEST
    score_thresh = cfg.MODEL.RETINANET.SCORE_THRESH_TEST
    nms_thresh = cfg.MODEL.RETINANET.NMS_THRESH_TEST
    max_dets = cfg.TEST.DETECTIONS_PER_IMAGE
    num_classes = pred_logits.shape[-1]
    anchors = jnp.asarray(anchors)
    b2b = Box2BoxTransform(tuple(cfg.MODEL.RETINANET.BBOX_REG_WEIGHTS))
    B = pred_logits.shape[0]

    offsets = np.concatenate([[0], np.cumsum(level_counts)])

    boxes_all, scores_all, classes_all, valid_all = [], [], [], []
    for li in range(len(level_counts)):
        s, e = int(offsets[li]), int(offsets[li + 1])
        lg = pred_logits[:, s:e]  # (B, Ri, K)
        k = min(topk_cand, lg.shape[1] * lg.shape[2])
        top_l, top_i = topk_flat_pairs(lg, k)
        top_p = jax.nn.sigmoid(top_l)
        keep = top_p > score_thresh
        anchor_idx = top_i // num_classes
        cls_idx = top_i % num_classes
        d = jnp.take_along_axis(pred_deltas[:, s:e], anchor_idx[..., None],
                                axis=1)
        box = b2b.apply_deltas(d, anchors[s:e][anchor_idx])
        boxes_all.append(box)
        scores_all.append(jnp.where(keep, top_p, 0.0))
        classes_all.append(cls_idx)
        valid_all.append(keep)
    boxes = jnp.concatenate(boxes_all, axis=1)
    scores = jnp.concatenate(scores_all, axis=1)
    classes = jnp.concatenate(classes_all, axis=1)
    valid = jnp.concatenate(valid_all, axis=1)

    def per_image(boxes, scores, classes, valid, hw):
        boxes = box_ops.clip(boxes, hw[0], hw[1])
        # bound the NMS sweep: keep top pre_nms candidates
        pre_nms = min(2000, boxes.shape[0])
        top_s, idx = jax.lax.top_k(jnp.where(valid, scores, -1.0), pre_nms)
        boxes, scores, classes = boxes[idx], top_s, classes[idx]
        valid = top_s > 0
        # post-top-k inference pools are shallow suppression DAGs: the
        # adaptive fixpoint beats the fixed-cost Pallas sweep reserved
        # for RPN training pools (ops/nms.py)
        keep = batched_nms_mask(boxes, scores, classes, valid,
                                nms_thresh, impl="fixpoint")
        return topk_detections(boxes, scores, classes, keep, max_dets)

    b, s, c, v = jax.vmap(per_image)(boxes, scores, classes, valid,
                                     image_sizes)
    return BatchedDetections(boxes=b, scores=s, classes=c, valid=v)
