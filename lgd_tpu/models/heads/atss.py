"""ATSS student — adaptive training sample selection over the FCOS tower.

Re-implements the behavior of the vendored cvpods ATSS (reference
models/customized_detectors/thirdparty_heads/atss.py:68-488 + the ATSSCT
wrapper): per-level top-k candidates by center distance against scale-8
pseudo-anchors, IoU threshold = mean + (sample-)std of candidate IoUs,
in-box constraint, max-IoU tie-breaking; losses = focal + centerness-
weighted GIoU * REG_WEIGHT + BCE centerness with globally-reduced
normalizers (gradient-equivalent to atss.py:199-201 all_reduce).
Assignment runs vectorized on padded (M, R) grids per image; padded GT rows
are excluded via the validity mask.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import losses as L
from ...structures import BatchedInstances, Shift2BoxTransform
from ...structures import boxes as box_ops
from .fcos import FCOSCT, fcos_inference  # tower + inference shared

INF = 1e8


class ATSSCT(FCOSCT):
    """Same decomposed module as FCOSCT (the reference reuses the FCOS tower,
    atss.py:97); assignment/losses differ (pure functions below)."""


def atss_ground_truth(cfg, shifts, level_counts, shift_strides,
                      gt: BatchedInstances):
    """Vectorized ATSS.get_ground_truth (atss.py:238-330).

    Returns gt_classes (B, R), gt_deltas (B, R, 4), gt_centerness (B, R)."""
    num_classes = cfg.MODEL.FCOS.NUM_CLASSES
    anchor_scale = cfg.MODEL.ATSS.ANCHOR_SCALE
    topk = cfg.MODEL.ATSS.TOPK
    tf = Shift2BoxTransform(tuple(cfg.MODEL.FCOS.BBOX_REG_WEIGHTS))
    shifts = jnp.asarray(shifts)          # (R, 2)
    shift_strides = jnp.asarray(shift_strides)  # (R,)
    offsets = np.concatenate([[0], np.cumsum(level_counts)])
    L_ = len(level_counts)

    # scale-8 pseudo anchors per shift (atss.py:283-289)
    half = shift_strides[:, None] * (anchor_scale / 2.0)
    anchors = jnp.concatenate([shifts - half, shifts + half], axis=-1)

    def per_image(args):
        boxes, classes, valid = args
        iou = box_ops.pairwise_iou(boxes, anchors)  # (M, R)
        deltas = tf.get_deltas(shifts[None], boxes[:, None, :])  # (M, R, 4)
        is_in = jnp.min(deltas, axis=-1) > 0

        centers = box_ops.centers(boxes)  # (M, 2)
        dist = jnp.sqrt(
            jnp.sum((centers[:, None, :] - shifts[None]) ** 2, axis=-1)
        )  # (M, R)

        # per-level top-k nearest candidates. The mask is built by a
        # broadcast compare against the top-k indices (identical semantics
        # to index scatter, incl. torch.topk's first-k-by-index tie order)
        # — scatters relayout the whole (M, R) workspace per level on TPU.
        cand_masks, cand_ious = [], []
        for li in range(L_):
            s, e = int(offsets[li]), int(offsets[li + 1])
            k = min(topk, e - s)
            _, idx = jax.lax.top_k(-dist[:, s:e], k)  # (M, k) smallest dist
            cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, e - s), 2)
            cand_masks.append(jnp.any(cols == idx[:, :, None], axis=1))
            cand_ious.append(jnp.take_along_axis(iou[:, s:e], idx, axis=1))
        cand_mask = jnp.concatenate(cand_masks, axis=1)  # (M, R)
        cand_ious = jnp.concatenate(cand_ious, axis=1)  # (M, k*L)

        mean = jnp.mean(cand_ious, axis=1, keepdims=True)
        # torch.std default: unbiased (ddof=1)
        n = cand_ious.shape[1]
        std = jnp.sqrt(
            jnp.sum((cand_ious - mean) ** 2, axis=1, keepdims=True)
            / max(n - 1, 1)
        )
        thr = mean + std  # (M, 1)

        fg = cand_mask & (iou >= thr) & is_in & valid[:, None]
        quality = jnp.where(fg, iou, -1.0)
        max_q = jnp.max(quality, axis=0)        # (R,)
        matched = jnp.argmax(quality, axis=0)   # (R,)

        gt_classes_i = jnp.where(max_q > -1.0, classes[matched],
                                 num_classes).astype(jnp.int32)
        gt_deltas_i = tf.get_deltas(shifts, boxes[matched])
        lr = gt_deltas_i[:, jnp.array([0, 2])]
        tb = gt_deltas_i[:, jnp.array([1, 3])]
        ctr = jnp.sqrt(
            jnp.clip(jnp.min(lr, -1) / jnp.maximum(jnp.max(lr, -1), 1e-12), 0)
            * jnp.clip(jnp.min(tb, -1) / jnp.maximum(jnp.max(tb, -1), 1e-12), 0)
        )
        return gt_classes_i, gt_deltas_i, ctr

    # lax.map, not vmap: one (M, R) slab at a time (see fcos.py /
    # retinanet.py:224-228 — the batched (B, M, R) workspaces are pure HBM
    # traffic, measured 3.6x slower for the RetinaNet assignment).
    return jax.lax.map(per_image, (gt.boxes, gt.classes, gt.valid))


def atss_losses(cfg, gt_classes, gt_deltas, gt_centerness,
                pred_logits, pred_deltas, pred_ctr):
    """atss.py:164-236: FCOS losses with loss_box_reg scaled by REG_WEIGHT."""
    num_classes = cfg.MODEL.FCOS.NUM_CLASSES
    fg = (gt_classes >= 0) & (gt_classes != num_classes)
    fg_f = fg.astype(jnp.float32)
    num_fg = jnp.sum(fg_f)
    num_targets = jnp.sum(gt_centerness * fg_f)

    onehot = jax.nn.one_hot(jnp.clip(gt_classes, 0, num_classes - 1),
                            num_classes) * fg_f[..., None]
    loss_cls = jnp.sum(
        L.sigmoid_focal_loss(pred_logits, onehot,
                             alpha=cfg.MODEL.FCOS.FOCAL_LOSS_ALPHA,
                             gamma=cfg.MODEL.FCOS.FOCAL_LOSS_GAMMA)
    ) / jnp.maximum(1.0, num_fg)

    reg = L.iou_loss(pred_deltas, gt_deltas, weight=gt_centerness,
                     box_mode="ltrb", loss_type=cfg.MODEL.FCOS.IOU_LOSS_TYPE)
    loss_box_reg = (jnp.sum(reg * fg_f) / jnp.maximum(1.0, num_targets)
                    * cfg.MODEL.FCOS.REG_WEIGHT)

    ctr_bce = L.binary_cross_entropy_with_logits(pred_ctr[..., 0],
                                                 gt_centerness)
    loss_centerness = jnp.sum(ctr_bce * fg_f) / jnp.maximum(1.0, num_fg)

    return {"loss_cls": loss_cls, "loss_box_reg": loss_box_reg,
            "loss_centerness": loss_centerness}


atss_inference = fcos_inference  # identical inference path (atss.py:332+)
