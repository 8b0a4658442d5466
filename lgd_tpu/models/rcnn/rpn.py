"""Region Proposal Network (Flax; padded static proposal counts).

Equivalent of detectron2's RPN + StandardRPNHead used by the reference's
R-CNN students (frcnn.py via configs/Base-RCNN-FPN.yaml RPN block;
SURVEY.md §2.2). TPU deltas: anchor labeling runs per image under lax.map;
the pos/neg minibatch subsample (256 @ 0.5) is a static-shape random-rank
selection; proposal generation emits a fixed (B, POST_NMS_TOPK, 4) padded
tensor with validity masks (the reference's ragged per-image proposal lists).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops import losses as L
from ...ops.matcher import Matcher
from ...ops.nms import batched_nms_mask
from ...structures import Box2BoxTransform, BatchedInstances
from ...structures import boxes as box_ops
from ..layers import normal_init
from ..heads.anchors import AnchorGenerator, feature_grid_sizes


class StandardRPNHead(nn.Module):
    num_anchors: int = 3
    channels: int = 0  # 0 -> input channels (detectron2: hidden = in_ch)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, features: List[jax.Array]):
        channels = self.channels or features[0].shape[-1]
        conv = nn.Conv(channels, (3, 3), padding="SAME",
                       kernel_init=normal_init(0.01), dtype=self.dtype,
                       name="conv")
        obj = nn.Conv(self.num_anchors, (1, 1),
                      kernel_init=normal_init(0.01), dtype=self.dtype,
                      name="objectness_logits")
        dlt = nn.Conv(self.num_anchors * 4, (1, 1),
                      kernel_init=normal_init(0.01), dtype=self.dtype,
                      name="anchor_deltas")
        logits, deltas = [], []
        for f in features:
            t = nn.relu(conv(f))
            logits.append(obj(t))
            deltas.append(dlt(t))
        return logits, deltas


def rpn_anchors(cfg, padded_hw, in_features):
    from ..layers import feature_strides

    strides = feature_strides(cfg, in_features)
    gen = AnchorGenerator(
        sizes=cfg.MODEL.ANCHOR_GENERATOR.SIZES,
        aspect_ratios=cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS,
        strides=strides,
        offset=cfg.MODEL.ANCHOR_GENERATOR.OFFSET,
    )
    grid_sizes = feature_grid_sizes(padded_hw, strides)
    per_level = gen(grid_sizes)
    return np.concatenate(per_level), [len(a) for a in per_level]


def subsample_labels(labels, num_samples: int, positive_fraction: float, rng):
    """detectron2 subsample_labels with static shapes: returns a bool mask of
    exactly <= num_samples selected anchors (random positives up to the
    fraction, random negatives filling the rest). labels: (R,) in {-1,0,1}.

    Selecting "the n highest random scores within the mask" is done with a
    k=num_samples top_k + threshold instead of a full argsort->rank scatter
    (identical masks — both keep the n largest uniforms; the two 102k-anchor
    argsorts were ~20 ms/step in the R-CNN profile)."""
    pos = labels == 1
    neg = labels == 0
    num_pos_max = int(num_samples * positive_fraction)
    rand = jax.random.uniform(rng, labels.shape)

    def select(mask, n, k):
        # top-n random scores within mask, n dynamic <= k static. If the
        # anchor pool R is smaller than k (tiny C4 canvases), clamp k; the
        # threshold index then clamps to the minimum in-mask score (-1.0
        # once the mask is exhausted), i.e. "take all of mask" — identical
        # to the argsort-rank formulation.
        k = min(k, labels.shape[0])
        score = jnp.where(mask, rand, -1.0)
        top = jax.lax.top_k(score, k)[0]
        idx = jnp.clip(n - 1, 0, k - 1)
        thresh = jnp.where(n > 0, top[idx], 2.0)
        return mask & (score >= thresh)

    n_pos = jnp.minimum(jnp.sum(pos), num_pos_max)
    pos_sel = select(pos, n_pos, num_pos_max)
    n_neg = num_samples - n_pos
    neg_sel = select(neg, n_neg, num_samples)
    return pos_sel, neg_sel


def label_rpn_anchors(cfg, anchors, gt: BatchedInstances):
    """-> gt_labels (B, R) in {-1, 0, 1}, matched_boxes (B, R, 4)."""
    matcher = Matcher(cfg.MODEL.RPN.IOU_THRESHOLDS, cfg.MODEL.RPN.IOU_LABELS,
                      allow_low_quality_matches=True)
    anchors = jnp.asarray(anchors)

    def per_image(args):
        boxes, valid = args
        iou = box_ops.pairwise_iou(boxes, anchors)
        matches, match_labels = matcher(iou, valid)
        return match_labels.astype(jnp.int32), boxes[matches]

    return jax.vmap(lambda b, v: per_image((b, v)))(gt.boxes, gt.valid)


def rpn_losses(cfg, pred_logits, pred_deltas, gt_labels, matched_boxes,
               anchors, rng):
    """detectron2 RPN.losses: smooth-L1 on sampled positives + BCE
    objectness on the sampled 256/image, normalized by B * 256."""
    B, R = gt_labels.shape
    transform = Box2BoxTransform(tuple(cfg.MODEL.RPN.BBOX_REG_WEIGHTS))
    anchors_j = jnp.asarray(anchors)

    rngs = jax.random.split(rng, B)
    pos_sel, neg_sel = jax.vmap(
        lambda l, r: subsample_labels(
            l, cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE,
            cfg.MODEL.RPN.POSITIVE_FRACTION, r)
    )(gt_labels, rngs)

    normalizer = float(B * cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE)

    gt_deltas = transform.get_deltas(anchors_j[None], matched_boxes)
    reg = L.smooth_l1_loss(pred_deltas, gt_deltas,
                           cfg.MODEL.RPN.SMOOTH_L1_BETA)
    loss_loc = jnp.sum(reg * pos_sel[..., None]) / normalizer

    obj_tgt = pos_sel.astype(jnp.float32)
    bce = L.binary_cross_entropy_with_logits(pred_logits[..., 0], obj_tgt)
    loss_obj = jnp.sum(bce * (pos_sel | neg_sel)) / normalizer

    w = cfg.MODEL.RPN.LOSS_WEIGHT
    return {"loss_rpn_cls": loss_obj * w, "loss_rpn_loc": loss_loc * w}


def generate_proposals(cfg, pred_logits, pred_deltas, anchors, level_counts,
                       image_sizes, training: bool):
    """detectron2 find_top_rpn_proposals on padded static shapes:
    per-level top-k -> decode -> clip -> level-batched NMS -> global top
    POST_NMS_TOPK. Returns (boxes (B, P, 4), scores (B, P), valid (B, P))."""
    pre_k = (cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN if training
             else cfg.MODEL.RPN.PRE_NMS_TOPK_TEST)
    post_k = (cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN if training
              else cfg.MODEL.RPN.POST_NMS_TOPK_TEST)
    nms_thresh = cfg.MODEL.RPN.NMS_THRESH
    min_size = cfg.MODEL.PROPOSAL_GENERATOR.MIN_SIZE
    transform = Box2BoxTransform(tuple(cfg.MODEL.RPN.BBOX_REG_WEIGHTS))
    anchors = jnp.asarray(anchors)
    offsets = np.concatenate([[0], np.cumsum(level_counts)])

    B = pred_logits.shape[0]
    obj = pred_logits[..., 0]  # (B, R): squeeze once so per-level top_k
    # slices a dense minor axis (no per-slice relayout of the padded
    # (B, R, 1) tensor)
    boxes_all, scores_all, lvl_all = [], [], []
    for li in range(len(level_counts)):
        s, e = int(offsets[li]), int(offsets[li + 1])
        k = min(pre_k, e - s)
        score, idx = jax.lax.top_k(obj[:, s:e], k)  # (B, k)
        d = jnp.take_along_axis(pred_deltas[:, s:e], idx[..., None], axis=1)
        box = transform.apply_deltas(d, anchors[s:e][idx])
        boxes_all.append(box)
        scores_all.append(score)
        lvl_all.append(jnp.full((B, k), li, jnp.int32))
    boxes = jnp.concatenate(boxes_all, axis=1)
    scores = jnp.concatenate(scores_all, axis=1)
    lvls = jnp.concatenate(lvl_all, axis=1)

    def per_image(boxes, scores, lvls, hw):
        boxes = box_ops.clip(boxes, hw[0], hw[1])
        valid = box_ops.nonempty(boxes, float(min_size))
        # keep the strongest 2*post_k before the O(N^2) NMS sweep
        cap = min(2 * post_k, boxes.shape[0])
        top_s, idx = jax.lax.top_k(jnp.where(valid, scores, -1e10), cap)
        boxes, lvls = boxes[idx], lvls[idx]
        valid = top_s > -1e9
        keep = batched_nms_mask(boxes, top_s, lvls, valid, nms_thresh)
        out_s, out_i = jax.lax.top_k(jnp.where(keep, top_s, -1e10), post_k)
        return boxes[out_i], out_s, out_s > -1e9

    b, s, v = jax.vmap(per_image)(boxes, scores, lvls, image_sizes)
    return b, s, v


class RPN(nn.Module):
    """Ties the head + labeling + losses + proposal generation together."""

    cfg: Any
    dtype: Any = jnp.bfloat16

    def setup(self):
        cfg = self.cfg
        self.in_features = tuple(cfg.MODEL.RPN.IN_FEATURES)
        num_anchors = (len(cfg.MODEL.ANCHOR_GENERATOR.SIZES[0])
                       * len(cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS[0]))
        # hidden channels = input channels (detectron2 StandardRPNHead):
        # 256 on FPN levels, 1024 on a raw C4 res4 trunk
        self.head = StandardRPNHead(num_anchors=num_anchors, channels=0,
                                    dtype=self.dtype, name="head")

    def __call__(self, feats: Dict[str, jax.Array]):
        """-> (logits (B, R, 1), deltas (B, R, 4)) concatenated over levels."""
        features = [feats[f] for f in self.in_features]
        logits, deltas = self.head(features)
        B = features[0].shape[0]
        logits = jnp.concatenate(
            [l.reshape(B, -1, 1) for l in logits], axis=1).astype(jnp.float32)
        deltas = jnp.concatenate(
            [d.reshape(B, -1, 4) for d in deltas], axis=1).astype(jnp.float32)
        return logits, deltas
