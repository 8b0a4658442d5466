"""POTO student — end-to-end (NMS-free-capable) one-to-one detector.

Re-implements the behavior of the vendored cvpods POTO (reference
models/customized_detectors/thirdparty_heads/poto.py:66-622 + POTOCT):
FCOS-style towers *without* centerness; GT assignment is a one-to-one
matching on quality = prob^(1-alpha) * IoU^alpha restricted to
center-sampled locations (poto.py:329-359); losses = focal + GIoU *
REG_WEIGHT normalized by globally-reduced num_foreground; inference skips
NMS when MODEL.NMS_TYPE == 'null'.

One-to-one matching on TPU: the reference calls scipy
``linear_sum_assignment`` on CPU (a device->host sync each step,
poto.py:359). The default here matches it exactly WITHOUT leaving the
device — ``MODEL.POTO.ASSIGNMENT = "hungarian"`` runs the exact
Jonker-Volgenant shortest-augmenting-path solver in ``ops/hungarian.py``
inside the jitted step (scipy-equal totals; no host sync; works under
sharded meshes and on PJRT backends that reject host callbacks — the axon
TPU plugin raises UNIMPLEMENTED for ``pure_callback``).
``ASSIGNMENT = "hungarian_host"`` keeps the scipy ``jax.pure_callback``
path as a parity oracle (CPU backends only). ``ASSIGNMENT = "greedy"``
opts into an on-device greedy one-to-one (pick the global max-quality
(gt, shift) pair, remove both, repeat M times inside a ``fori_loop``);
for POTO's quality surface (sharply peaked per GT) greedy agrees with
Hungarian except under heavy same-class crowding —
tests/test_poto_assignment.py measures the disagreement on crowded
synthetic scenes.
"""

from __future__ import annotations

import math
from typing import Any, List

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops import losses as L
from ...ops.nms import batched_nms_mask, topk_detections
from ...ops.topk import topk_flat_pairs
from ...structures import BatchedDetections, BatchedInstances, Shift2BoxTransform
from ...structures import boxes as box_ops
from ..layers import Scale, constant_init, normal_init
from .fcos import FCOSCT

INF = 1e8


class POTOHead(nn.Module):
    """FCOS towers, no centerness branch (poto.py:523-622)."""

    num_classes: int = 80
    num_convs: int = 4
    num_levels: int = 5
    prior_prob: float = 0.01
    channels: int = 256
    norm_reg_targets: bool = True
    fpn_strides: tuple = (8, 16, 32, 64, 128)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, features: List[jax.Array]):
        conv_kw = dict(kernel_size=(3, 3), padding="SAME", dtype=self.dtype,
                       kernel_init=normal_init(0.01),
                       bias_init=nn.initializers.zeros)
        cls_convs = [nn.Conv(self.channels, name=f"cls_subnet_{i}", **conv_kw)
                     for i in range(self.num_convs)]
        box_convs = [nn.Conv(self.channels, name=f"bbox_subnet_{i}", **conv_kw)
                     for i in range(self.num_convs)]
        gn_cls = [nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32,
                               name=f"cls_gn_{i}") for i in range(self.num_convs)]
        gn_box = [nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32,
                               name=f"bbox_gn_{i}") for i in range(self.num_convs)]
        bias_value = -math.log((1 - self.prior_prob) / self.prior_prob)
        cls_score = nn.Conv(self.num_classes, name="cls_score",
                            kernel_size=(3, 3), padding="SAME",
                            dtype=self.dtype, kernel_init=normal_init(0.01),
                            bias_init=constant_init(bias_value))
        bbox_pred = nn.Conv(4, name="bbox_pred", **conv_kw)
        scales = [Scale(init_value=1.0, name=f"scale_{i}")
                  for i in range(self.num_levels)]

        logits, bbox_reg = [], []
        for level, f in enumerate(features):
            c = f
            for conv, gn in zip(cls_convs, gn_cls):
                c = nn.relu(gn(conv(c)).astype(self.dtype))
            b = f
            for conv, gn in zip(box_convs, gn_box):
                b = nn.relu(gn(conv(b)).astype(self.dtype))
            logits.append(cls_score(c))
            pred = scales[level](bbox_pred(b))
            if self.norm_reg_targets:
                bbox_reg.append(nn.relu(pred) * self.fpn_strides[level])
            else:
                bbox_reg.append(jnp.exp(pred))
        return logits, bbox_reg


class POTOCT(FCOSCT):
    """Decomposed student (reference models/customized_detectors/poto.py);
    swaps the head for POTOHead and a 2-tuple predict."""

    def _make_head(self):
        cfg = self.cfg
        return POTOHead(
            num_classes=self.num_classes,
            num_convs=cfg.MODEL.FCOS.NUM_CONVS,
            num_levels=len(self.in_features),
            prior_prob=cfg.MODEL.FCOS.PRIOR_PROB,
            channels=cfg.MODEL.FPN.OUT_CHANNELS,
            norm_reg_targets=cfg.MODEL.FCOS.NORM_REG_TARGETS,
            fpn_strides=self.fpn_strides,
            dtype=self.dtype,
            name="head",
        )

    def predict(self, features: List[jax.Array]):
        logits, deltas = self.head(features)
        B = features[0].shape[0]
        cat = lambda xs, k: jnp.concatenate(
            [x.reshape(B, -1, k) for x in xs], axis=1).astype(jnp.float32)
        return cat(logits, self.num_classes), cat(deltas, 4)

    def init_all(self, images, image_sizes):
        raw, feats = self(images, image_sizes)
        return self.predict([feats[f] for f in self.in_features])


def greedy_one_to_one(quality):
    """Greedy max-quality one-to-one assignment on a (M, R) matrix with
    masked entries = -inf. Returns shift_for_gt (M,) int32 (-1 if none)."""
    M, R = quality.shape

    def body(i, carry):
        q, assign = carry
        flat = jnp.argmax(q)
        gi, si = flat // R, flat % R
        valid = q[gi, si] > -INF
        assign = assign.at[gi].set(jnp.where(valid, si, assign[gi]))
        q = q.at[gi, :].set(-INF)
        q = q.at[:, si].set(jnp.where(valid, -INF, q[:, si]))
        return q, assign

    _, assign = jax.lax.fori_loop(
        0, M, body, (quality, jnp.full((M,), -1, jnp.int32)))
    return assign


def hungarian_host_one_to_one(quality):
    """Exact linear-sum assignment via scipy on the host (pure_callback) —
    kept as the parity oracle for the on-device solver (the reference's
    matching, poto.py:359). One device<->host sync per step; REJECTED by
    the axon TPU PJRT plugin (no host send/recv callbacks) — use the
    default on-device ``hungarian`` there.
    quality: (B, M, R) with -INF masking. Returns (B, M) int32 (-1 = none)."""
    import numpy as np

    def host_fn(q):
        from scipy.optimize import linear_sum_assignment

        q = np.asarray(q)
        out = np.full(q.shape[:2], -1, np.int32)
        for b in range(q.shape[0]):
            rows, cols = linear_sum_assignment(q[b], maximize=True)
            keep = q[b][rows, cols] > -INF / 2
            out[b][rows[keep]] = cols[keep].astype(np.int32)
        return out

    return jax.pure_callback(
        host_fn,
        jax.ShapeDtypeStruct(quality.shape[:2], jnp.int32),
        quality,
        vmap_method="broadcast_all",
    )


def poto_ground_truth(cfg, shifts, shift_strides, gt: BatchedInstances,
                      pred_logits, pred_deltas):
    """poto.py:288-385: quality-based one-to-one assignment.

    Returns gt_classes (B, R), gt_deltas (B, R, 4)."""
    num_classes = cfg.MODEL.FCOS.NUM_CLASSES
    alpha = cfg.MODEL.POTO.ALPHA
    radius = cfg.MODEL.POTO.CENTER_SAMPLING_RADIUS
    tf = Shift2BoxTransform(tuple(cfg.MODEL.FCOS.BBOX_REG_WEIGHTS))
    shifts = jnp.asarray(shifts)
    shift_strides = jnp.asarray(shift_strides)

    pred_logits = jax.lax.stop_gradient(pred_logits)
    pred_deltas = jax.lax.stop_gradient(pred_deltas)

    def quality_fn(args):
        boxes, classes, valid, logits, deltas_pred = args
        probs = jax.nn.sigmoid(logits)  # (R, K)
        prob_gt = probs[:, classes].T  # (M, R)
        pred_boxes = tf.apply_deltas(deltas_pred, shifts)  # (R, 4)
        iou = box_ops.pairwise_iou(boxes, pred_boxes)  # (M, R)
        quality = prob_gt ** (1 - alpha) * iou ** alpha

        if radius > 0:
            centers = box_ops.centers(boxes)
            r = shift_strides * radius
            lo = jnp.maximum(centers[:, None, :] - r[None, :, None],
                             boxes[:, None, :2])
            hi = jnp.minimum(centers[:, None, :] + r[None, :, None],
                             boxes[:, None, 2:])
            center_deltas = jnp.concatenate(
                [shifts[None] - lo, hi - shifts[None]], axis=-1)
            is_in = jnp.min(center_deltas, axis=-1) > 0
        else:
            deltas = tf.get_deltas(shifts[None], boxes[:, None, :])
            is_in = jnp.min(deltas, axis=-1) > 0

        return jnp.where(is_in & valid[:, None], quality, -INF)

    quality = jax.vmap(
        lambda b, c, v, l, d: quality_fn((b, c, v, l, d)))(
        gt.boxes, gt.classes, gt.valid, pred_logits, pred_deltas
    )  # (B, M, R)

    assignment = getattr(cfg.MODEL.POTO, "ASSIGNMENT", "greedy")
    if assignment == "hungarian":
        from ...ops.hungarian import max_quality_assignment
        assign = jax.vmap(
            lambda q: max_quality_assignment(q, penalty=-INF))(quality)
    elif assignment == "hungarian_host":
        assign = hungarian_host_one_to_one(quality)  # (B, M)
    elif assignment == "greedy":
        assign = jax.vmap(greedy_one_to_one)(quality)
    else:
        raise ValueError(f"unknown MODEL.POTO.ASSIGNMENT {assignment!r}")

    R = shifts.shape[0]

    def targets_fn(args):
        assign_i, boxes, classes = args
        # out-of-bounds index + mode='drop' discards unassigned rows
        scatter_idx = jnp.where(assign_i >= 0, assign_i, R)
        gt_classes_i = jnp.full((R,), num_classes, jnp.int32).at[
            scatter_idx
        ].set(classes.astype(jnp.int32), mode="drop")
        safe = jnp.where(assign_i >= 0, assign_i, 0)
        tgt = tf.get_deltas(shifts[safe], boxes)
        gt_deltas_i = jnp.zeros((R, 4), jnp.float32).at[scatter_idx].set(
            tgt, mode="drop")
        return gt_classes_i, gt_deltas_i

    return jax.vmap(lambda a, b, c: targets_fn((a, b, c)))(
        assign, gt.boxes, gt.classes)


def poto_losses(cfg, gt_classes, gt_deltas, pred_logits, pred_deltas):
    """poto.py:230-285 with global-batch normalizer."""
    num_classes = cfg.MODEL.FCOS.NUM_CLASSES
    fg = (gt_classes >= 0) & (gt_classes != num_classes)
    fg_f = fg.astype(jnp.float32)
    num_fg = jnp.sum(fg_f)

    onehot = jax.nn.one_hot(jnp.clip(gt_classes, 0, num_classes - 1),
                            num_classes) * fg_f[..., None]
    loss_cls = jnp.sum(
        L.sigmoid_focal_loss(pred_logits, onehot,
                             alpha=cfg.MODEL.FCOS.FOCAL_LOSS_ALPHA,
                             gamma=cfg.MODEL.FCOS.FOCAL_LOSS_GAMMA)
    ) / jnp.maximum(1.0, num_fg)

    reg = L.iou_loss(pred_deltas, gt_deltas, box_mode="ltrb",
                     loss_type=cfg.MODEL.FCOS.IOU_LOSS_TYPE)
    loss_box_reg = (jnp.sum(reg * fg_f) / jnp.maximum(1.0, num_fg)
                    * cfg.MODEL.POTO.REG_WEIGHT)

    return {"loss_cls": loss_cls, "loss_box_reg": loss_box_reg}


def poto_inference(cfg, pred_logits, pred_deltas, shifts, level_counts,
                   image_sizes) -> BatchedDetections:
    """poto.py:386-489: per-level top-k; NMS skipped when nms_type='null'."""
    topk_cand = cfg.MODEL.FCOS.TOPK_CANDIDATES_TEST
    score_thresh = cfg.MODEL.FCOS.SCORE_THRESH_TEST
    nms_thresh = cfg.MODEL.FCOS.NMS_THRESH_TEST
    nms_type = cfg.MODEL.NMS_TYPE
    max_dets = cfg.TEST.DETECTIONS_PER_IMAGE
    num_classes = pred_logits.shape[-1]
    tf = Shift2BoxTransform(tuple(cfg.MODEL.FCOS.BBOX_REG_WEIGHTS))
    shifts = jnp.asarray(shifts)
    offsets = np.concatenate([[0], np.cumsum(level_counts)])

    B = pred_logits.shape[0]
    boxes_all, scores_all, classes_all, valid_all = [], [], [], []
    for li in range(len(level_counts)):
        s, e = int(offsets[li]), int(offsets[li + 1])
        lg = pred_logits[:, s:e]  # (B, Ri, K)
        k = min(topk_cand, lg.shape[1] * lg.shape[2])
        top_l, top_i = topk_flat_pairs(lg, k)
        top_p = jax.nn.sigmoid(top_l)
        keep = top_p > score_thresh
        shift_idx = top_i // num_classes
        cls_idx = top_i % num_classes
        d = jnp.take_along_axis(pred_deltas[:, s:e], shift_idx[..., None],
                                axis=1)
        box = tf.apply_deltas(d, shifts[s:e][shift_idx])
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
        if nms_type == "null":
            keep = valid
        else:
            pre_nms = min(2000, boxes.shape[0])
            top_s, idx = jax.lax.top_k(jnp.where(valid, scores, -1.0), pre_nms)
            boxes, scores, classes = boxes[idx], top_s, classes[idx]
            valid = top_s > 0
            # post-top-k inference pools are shallow suppression DAGs:
            # the adaptive fixpoint beats the fixed-cost Pallas sweep
            # reserved for RPN training pools (ops/nms.py)
            keep = batched_nms_mask(boxes, scores, classes, valid,
                                    nms_thresh, impl="fixpoint")
        return topk_detections(boxes, scores, classes, keep, max_dets)

    b, s, c, v = jax.vmap(per_image)(boxes, scores, classes, valid,
                                     image_sizes)
    return BatchedDetections(boxes=b, scores=s, classes=c, valid=v)
