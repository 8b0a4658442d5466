"""ROI heads: proposal sampling, box head, mask head (StandardROIHeads).

Equivalents of detectron2 StandardROIHeads + FastRCNNConvFCHead +
MaskRCNNConvUpsampleHead as configured by the reference
(configs/Base-RCNN-FPN.yaml:22-33; SURVEY.md §2.2). TPU deltas:

- proposal<->GT matching and the 512 @ 0.25 minibatch sample are
  static-shape random-rank selections compacted to a fixed (B, 512) slab;
- ROI pooling is the single fused multilevel gather (ops.roi_align);
- mask targets are bilinear crops of the host-rasterized stride-aligned GT
  bitmasks instead of per-polygon CPU rasterization (exactness bounded by
  TPU.SEGMASK_STRIDE).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops import losses as L
from ...ops.matcher import Matcher
from ...ops.nms import batched_nms_mask, topk_detections
from ...ops.roi_align import multilevel_roi_align
from ...structures import Box2BoxTransform, BatchedDetections, BatchedInstances
from ...structures import boxes as box_ops
from ..layers import normal_init
from .rpn import subsample_labels


class FastRCNNConvFCHead(nn.Module):
    """NUM_FC=2 x FC(1024) on pooled 7x7 features."""

    num_fc: int = 2
    fc_dim: int = 1024
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):  # (B, P, 7, 7, C)
        B, P = x.shape[:2]
        x = x.reshape(B, P, -1)
        for i in range(self.num_fc):
            x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype,
                                 name=f"fc{i + 1}")(x))
        return x


class FastRCNNOutputLayers(nn.Module):
    num_classes: int = 80
    cls_agnostic: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        scores = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                          kernel_init=normal_init(0.01), name="cls_score")(x)
        nbox = 1 if self.cls_agnostic else self.num_classes
        deltas = nn.Dense(nbox * 4, dtype=self.dtype,
                          kernel_init=normal_init(0.001), name="bbox_pred")(x)
        return scores.astype(jnp.float32), deltas.astype(jnp.float32)


class MaskRCNNConvUpsampleHead(nn.Module):
    """NUM_CONV x conv3x3 + deconv2x + 1x1 -> K masks at 2*pool res."""

    num_classes: int = 80
    num_conv: int = 4
    conv_dim: int = 256
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):  # (B, P, 14, 14, C)
        B, P, H, W, C = x.shape
        x = x.reshape(B * P, H, W, C)
        for i in range(self.num_conv):
            x = nn.relu(nn.Conv(self.conv_dim, (3, 3), padding="SAME",
                                kernel_init=normal_init(0.001),
                                dtype=self.dtype, name=f"mask_fcn{i + 1}")(x))
        x = nn.relu(nn.ConvTranspose(self.conv_dim, (2, 2), strides=(2, 2),
                                     dtype=self.dtype, name="deconv")(x))
        x = nn.Conv(self.num_classes, (1, 1),
                    kernel_init=normal_init(0.001), dtype=self.dtype,
                    name="predictor")(x)
        return x.reshape(B, P, 2 * H, 2 * W,
                         self.num_classes).astype(jnp.float32)


def label_and_sample_proposals(cfg, proposals, prop_valid, gt, rng):
    """detectron2 StandardROIHeads.label_and_sample_proposals: append GT,
    match at IoU 0.5, sample 512 @ 0.25 into a fixed slab.

    Returns dict with boxes (B, S, 4), classes (B, S) [K = background],
    matched_gt (B, S) gt slot index, valid (B, S)."""
    matcher = Matcher(cfg.MODEL.ROI_HEADS.IOU_THRESHOLDS,
                      cfg.MODEL.ROI_HEADS.IOU_LABELS,
                      allow_low_quality_matches=False)
    num_classes = cfg.MODEL.ROI_HEADS.NUM_CLASSES
    S = cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE
    frac = cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION

    if cfg.MODEL.ROI_HEADS.PROPOSAL_APPEND_GT:
        proposals = jnp.concatenate([proposals, gt.boxes], axis=1)
        prop_valid = jnp.concatenate([prop_valid, gt.valid], axis=1)

    B = proposals.shape[0]
    rngs = jax.random.split(rng, B)

    def per_image(args):
        props, pvalid, boxes, classes, valid, r = args
        iou = box_ops.pairwise_iou(boxes, props)  # (M, P')
        matches, match_labels = matcher(iou, valid)
        # invalid proposals are ignored outright
        labels = jnp.where(pvalid, match_labels.astype(jnp.int32), -1)
        cls = jnp.where(labels == 1, classes[matches], num_classes)

        r1, r2 = jax.random.split(r)
        pos_sel, neg_sel = subsample_labels(labels, S, frac, r1)
        sel = pos_sel | neg_sel
        score = jnp.where(sel, 1.0 + jax.random.uniform(r2, sel.shape), -1.0)
        # proposal pool can be < S on tiny configs; pad the slab with
        # invalid slots (top = -1 -> valid False)
        k = min(S, score.shape[0])
        top, idx = jax.lax.top_k(score, k)
        if k < S:
            top = jnp.pad(top, (0, S - k), constant_values=-1.0)
            idx = jnp.pad(idx, (0, S - k))
        return (props[idx], cls[idx].astype(jnp.int32), matches[idx],
                top > 0.0, pos_sel[idx])

    boxes, classes, matched, valid, is_fg = jax.vmap(
        lambda p, pv, b, c, v, r: per_image((p, pv, b, c, v, r)))(
        proposals, prop_valid, gt.boxes, gt.classes, gt.valid, rngs)
    return {"boxes": boxes, "classes": classes, "matched_gt": matched,
            "valid": valid, "is_fg": is_fg & valid}


def fast_rcnn_losses(cfg, scores, deltas, sampled, gt: BatchedInstances):
    """FastRCNNOutputs losses: softmax CE (mean over sampled) + smooth-L1 on
    fg class-specific deltas (sum / #sampled)."""
    num_classes = cfg.MODEL.ROI_HEADS.NUM_CLASSES
    transform = Box2BoxTransform(tuple(cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_WEIGHTS))
    valid = sampled["valid"]
    is_fg = sampled["is_fg"]
    classes = sampled["classes"]

    logp = jax.nn.log_softmax(scores, axis=-1)
    ce = -jnp.take_along_axis(logp, classes[..., None], axis=-1)[..., 0]
    n_valid = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    loss_cls = jnp.sum(ce * valid) / n_valid

    # class-specific deltas for fg proposals
    B, S = classes.shape
    matched_boxes = jnp.take_along_axis(
        gt.boxes, sampled["matched_gt"][..., None], axis=1)
    gt_deltas = transform.get_deltas(sampled["boxes"], matched_boxes)
    if cfg.MODEL.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG:
        fg_deltas = deltas.reshape(B, S, 4)
    else:
        deltas_r = deltas.reshape(B, S, num_classes, 4)
        cls_safe = jnp.clip(classes, 0, num_classes - 1)
        fg_deltas = jnp.take_along_axis(
            deltas_r, cls_safe[..., None, None].repeat(4, -1), axis=2
        )[..., 0, :]
    reg = L.smooth_l1_loss(fg_deltas, gt_deltas,
                           cfg.MODEL.ROI_BOX_HEAD.SMOOTH_L1_BETA)
    loss_reg = jnp.sum(reg * is_fg[..., None]) / n_valid
    return {"loss_cls": loss_cls, "loss_box_reg": loss_reg}


def take_fg_subset(sampled, k: int):
    """Static (B, k) foreground-first subset of the sampled proposals for
    the mask head: detectron2 runs mask loss on fg proposals only; the
    sampler caps fg at BATCH_SIZE_PER_IMAGE * POSITIVE_FRACTION = k, so a
    top-k on the fg mask captures every foreground slot exactly — the mask
    head then runs on k ROIs instead of all S (4x less pooling/compute at
    the defaults)."""
    score = sampled["is_fg"].astype(jnp.float32)
    _, idx = jax.lax.top_k(score, k)  # fg first; ties keep lowest index
    take2 = lambda a: jnp.take_along_axis(a, idx, axis=1)
    return {
        "boxes": jnp.take_along_axis(sampled["boxes"], idx[..., None],
                                     axis=1),
        "classes": take2(sampled["classes"]),
        "matched_gt": take2(sampled["matched_gt"]),
        "valid": take2(sampled["valid"]),
        "is_fg": take2(sampled["is_fg"]),
    }


def crop_bitmasks(bitmasks, matched_gt, boxes, out: int, stride: int):
    """Bilinear-sample each matched GT bitmask over its proposal box grid ->
    (B, S, out, out) float targets (detectron2 crop_and_resize equivalent on
    the stride-aligned raster)."""
    B, M, Hs, Ws = bitmasks.shape
    S = boxes.shape[1]
    masks = jnp.take_along_axis(
        bitmasks.astype(jnp.float32),
        matched_gt[..., None, None].astype(jnp.int32), axis=1
    )  # (B, S, Hs, Ws) via broadcasting of the gather
    g = (jnp.arange(out, dtype=jnp.float32) + 0.5) / out
    x = (boxes[..., 0:1] + (boxes[..., 2:3] - boxes[..., 0:1]) * g) / stride - 0.5
    y = (boxes[..., 1:2] + (boxes[..., 3:4] - boxes[..., 1:2]) * g) / stride - 0.5

    def bil(coord, size):
        c0 = jnp.floor(coord)
        f = coord - c0
        c0 = jnp.clip(c0.astype(jnp.int32), 0, size - 1)
        c1 = jnp.clip(c0 + 1, 0, size - 1)
        return c0, c1, f

    y0, y1, fy = bil(y, Hs)
    x0, x1, fx = bil(x, Ws)

    def sample(m, yi, xi):  # m: (B,S,Hs,Ws); yi/xi: (B,S,out)
        rows = jnp.take_along_axis(
            m, yi[..., :, None].repeat(Ws, -1), axis=2)  # (B,S,out,Ws)
        return jnp.take_along_axis(rows, xi[..., None, :].repeat(out, -2),
                                   axis=3)  # (B,S,out,out)

    m00 = sample(masks, y0, x0)
    m01 = sample(masks, y0, x1)
    m10 = sample(masks, y1, x0)
    m11 = sample(masks, y1, x1)
    fy_ = fy[..., :, None]
    fx_ = fx[..., None, :]
    out_m = (m00 * (1 - fy_) * (1 - fx_) + m01 * (1 - fy_) * fx_
             + m10 * fy_ * (1 - fx_) + m11 * fy_ * fx_)
    return (out_m >= 0.5).astype(jnp.float32)


def crop_gt_frame_masks(mask_crops, gt_boxes, matched_gt, boxes, out: int):
    """Mask targets from exact GT-box-frame polygon rasters: gather each
    proposal's matched (G, G) crop + GT box, map the proposal's out x out
    cell centers into the GT-box frame, bilinear-sample (zero outside the
    GT box — polygons live inside their box), threshold 0.5.

    Near-exact equivalent of detectron2 PolygonMasks.crop_and_resize(
    proposal_boxes, out) (used by mask_rcnn_loss): the only approximation
    is resampling the 2x-resolution exact raster instead of re-rasterizing
    the polygon per proposal (quantified in tests/test_mask_targets.py)."""
    B, M, G, _ = mask_crops.shape
    S = boxes.shape[1]
    idx = matched_gt.astype(jnp.int32)
    crops = jnp.take_along_axis(
        mask_crops.astype(jnp.float32), idx[..., None, None], axis=1
    )  # (B, S, G, G)
    gbox = jnp.take_along_axis(gt_boxes, idx[..., None], axis=1)  # (B, S, 4)

    g = (jnp.arange(out, dtype=jnp.float32) + 0.5) / out
    px = boxes[..., 0:1] + (boxes[..., 2:3] - boxes[..., 0:1]) * g
    py = boxes[..., 1:2] + (boxes[..., 3:4] - boxes[..., 1:2]) * g
    gw = jnp.maximum(gbox[..., 2:3] - gbox[..., 0:1], 1e-3)
    gh = jnp.maximum(gbox[..., 3:4] - gbox[..., 1:2], 1e-3)
    u = (px - gbox[..., 0:1]) / gw * G - 0.5   # (B, S, out)
    v = (py - gbox[..., 1:2]) / gh * G - 0.5

    def bil(coord):
        inb = (coord > -1.0) & (coord < G)  # outside the GT box -> 0
        c = jnp.clip(coord, 0.0, G - 1.0)
        c0 = jnp.floor(c)
        f = c - c0
        c0i = c0.astype(jnp.int32)
        c1i = jnp.minimum(c0i + 1, G - 1)
        return (c0i, (1 - f) * inb), (c1i, f * inb)

    (v0, wv0), (v1, wv1) = bil(v)
    (u0, wu0), (u1, wu1) = bil(u)

    def sample(yi, xi):  # (B,S,out) each -> (B,S,out,out)
        rows = jnp.take_along_axis(
            crops, yi[..., :, None].repeat(G, -1), axis=2)
        return jnp.take_along_axis(rows, xi[..., None, :].repeat(out, -2),
                                   axis=3)

    m = (sample(v0, u0) * (wv0[..., :, None] * wu0[..., None, :])
         + sample(v0, u1) * (wv0[..., :, None] * wu1[..., None, :])
         + sample(v1, u0) * (wv1[..., :, None] * wu0[..., None, :])
         + sample(v1, u1) * (wv1[..., :, None] * wu1[..., None, :]))
    return (m >= 0.5).astype(jnp.float32)


def mask_rcnn_loss(cfg, mask_logits, sampled, gt: BatchedInstances):
    """BCE over fg ROIs' class channel vs cropped GT masks (detectron2
    mask_rcnn_loss; mean over fg pixels)."""
    num_classes = cfg.MODEL.ROI_HEADS.NUM_CLASSES
    out = mask_logits.shape[2]
    cls_safe = jnp.clip(sampled["classes"], 0, num_classes - 1)
    per_cls = jnp.take_along_axis(
        mask_logits, cls_safe[..., None, None, None], axis=-1)[..., 0]
    if gt.mask_crops is not None:
        targets = crop_gt_frame_masks(gt.mask_crops, gt.boxes,
                                      sampled["matched_gt"],
                                      sampled["boxes"], out)
    else:
        # fallback: canvas-wide stride raster (coarser; kept for batches
        # without polygon crops)
        targets = crop_bitmasks(gt.bitmasks, sampled["matched_gt"],
                                sampled["boxes"], out, cfg_stride(cfg))
    bce = L.binary_cross_entropy_with_logits(per_cls, targets)
    fg = sampled["is_fg"][..., None, None]
    n = jnp.maximum(jnp.sum(fg.astype(jnp.float32)) * out * out, 1.0)
    return jnp.sum(bce * fg) / n


def cfg_stride(cfg):
    return cfg.TPU.SEGMASK_STRIDE


def fast_rcnn_inference(cfg, scores, deltas, proposals, prop_valid,
                        image_sizes) -> BatchedDetections:
    """Per-class decode -> score filter -> class-aware NMS -> top 100."""
    num_classes = cfg.MODEL.ROI_HEADS.NUM_CLASSES
    transform = Box2BoxTransform(tuple(cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_WEIGHTS))
    score_thresh = cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST
    nms_thresh = cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST
    max_dets = cfg.TEST.DETECTIONS_PER_IMAGE

    def per_image(args):
        sc, dl, props, pvalid, hw = args  # (P, K+1), (P, K*4), (P, 4)
        P = sc.shape[0]
        probs = jax.nn.softmax(sc, axis=-1)[:, :num_classes]  # (P, K)
        if cfg.MODEL.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG:
            boxes = transform.apply_deltas(dl.reshape(P, 4), props)
            boxes = jnp.broadcast_to(boxes[:, None, :], (P, num_classes, 4))
        else:
            boxes = transform.apply_deltas(
                dl.reshape(P, num_classes, 4), props[:, None, :])
        boxes = box_ops.clip(boxes, hw[0], hw[1])
        flat_scores = probs.reshape(-1)
        flat_boxes = boxes.reshape(-1, 4)
        flat_cls = jnp.tile(jnp.arange(num_classes), (P,))
        valid = (flat_scores > score_thresh) & jnp.repeat(pvalid, num_classes)
        k = min(2000, flat_scores.shape[0])
        top_s, idx = jax.lax.top_k(jnp.where(valid, flat_scores, -1.0), k)
        b, c = flat_boxes[idx], flat_cls[idx]
        v = top_s > 0
        # shallow inference pool -> adaptive fixpoint (ops/nms.py)
        keep = batched_nms_mask(b, top_s, c, v, nms_thresh,
                                impl="fixpoint")
        return topk_detections(b, top_s, c, keep, max_dets)

    b, s, c, v = jax.vmap(
        lambda sc, dl, p, pv, hw: per_image((sc, dl, p, pv, hw)))(
        scores, deltas, proposals, prop_valid, image_sizes)
    return BatchedDetections(boxes=b, scores=s, classes=c, valid=v)


class StandardROIHeads(nn.Module):
    """Box (+ optional mask) heads over the shared ROI pooler."""

    cfg: Any
    dtype: Any = jnp.bfloat16

    def setup(self):
        cfg = self.cfg
        self.in_features = tuple(cfg.MODEL.ROI_HEADS.IN_FEATURES)
        self.box_head = FastRCNNConvFCHead(
            num_fc=cfg.MODEL.ROI_BOX_HEAD.NUM_FC,
            fc_dim=cfg.MODEL.ROI_BOX_HEAD.FC_DIM,
            dtype=self.dtype, name="box_head")
        self.box_predictor = FastRCNNOutputLayers(
            num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
            cls_agnostic=cfg.MODEL.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG,
            dtype=self.dtype, name="box_predictor")
        self.mask_on = cfg.MODEL.MASK_ON
        if self.mask_on:
            self.mask_head = MaskRCNNConvUpsampleHead(
                num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
                num_conv=cfg.MODEL.ROI_MASK_HEAD.NUM_CONV,
                conv_dim=cfg.MODEL.ROI_MASK_HEAD.CONV_DIM,
                dtype=self.dtype, name="mask_head")

    def _pool(self, feats, boxes, valid, resolution, sampling_ratio):
        from ..layers import feature_strides

        features = [feats[f] for f in self.in_features]
        s = feature_strides(self.cfg, self.in_features)
        return multilevel_roi_align(
            features, boxes, valid, s, resolution,
            min_level=int(np.log2(s[0])),
            sampling_ratio=sampling_ratio,
            impl=self.cfg.TPU.ROI_ALIGN_IMPL)

    def box_forward(self, feats, boxes, valid):
        pooled = self._pool(
            feats, boxes, valid,
            self.cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION,
            self.cfg.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO)
        x = self.box_head(pooled.astype(self.dtype))
        return self.box_predictor(x)

    def mask_forward(self, feats, boxes, valid):
        pooled = self._pool(
            feats, boxes, valid,
            self.cfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION,
            self.cfg.MODEL.ROI_MASK_HEAD.POOLER_SAMPLING_RATIO)
        return self.mask_head(pooled.astype(self.dtype))


class Res5ROIHeads(nn.Module):
    """C4 ROI heads (detectron2 Res5ROIHeads; reference surface via
    configs/Base-RCNN-C4.yaml): pool res4 at 14x14, run the res5 stage as
    the shared box head, mean-pool to the linear predictors; the mask head
    (when MASK_ON) is a deconv+1x1 on the same res5 output. Presents the
    StandardROIHeads box_forward/mask_forward API, so RCNNCT.predict/
    infer_boxes drive it unchanged (mask_forward recomputes res5 on its ROI
    set — C4 is a parity surface here, not the perf path)."""

    cfg: Any
    dtype: Any = jnp.bfloat16

    def setup(self):
        cfg = self.cfg
        r = cfg.MODEL.RESNETS
        from ..backbones.resnet import _STAGE_BLOCKS, BottleneckBlock

        n_block = _STAGE_BLOCKS[r.DEPTH][3]
        width = r.NUM_GROUPS * r.WIDTH_PER_GROUP
        self.res5 = [
            BottleneckBlock(
                out_channels=r.RES2_OUT_CHANNELS * 8,
                bottleneck_channels=width * 8,
                stride=2 if i == 0 else 1,
                num_groups=r.NUM_GROUPS,
                norm=r.NORM,
                stride_in_1x1=r.STRIDE_IN_1X1,
                dtype=self.dtype,
                name=f"res5_{i}",
            )
            for i in range(n_block)
        ]
        self.in_features = tuple(cfg.MODEL.ROI_HEADS.IN_FEATURES)
        self.box_predictor = FastRCNNOutputLayers(
            num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
            cls_agnostic=cfg.MODEL.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG,
            dtype=self.dtype, name="box_predictor")
        self.mask_on = cfg.MODEL.MASK_ON
        if self.mask_on:
            self.mask_head = MaskRCNNConvUpsampleHead(
                num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
                num_conv=0,  # detectron2 C4 mask head: deconv + predictor
                conv_dim=cfg.MODEL.ROI_MASK_HEAD.CONV_DIM,
                dtype=self.dtype, name="mask_head")

    def _res5_features(self, feats, boxes, valid):
        from ..layers import feature_strides

        cfg = self.cfg
        s = feature_strides(cfg, self.in_features)
        pooled = multilevel_roi_align(
            [feats[f] for f in self.in_features], boxes, valid, s,
            cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION,
            min_level=int(np.log2(s[0])),
            sampling_ratio=cfg.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO,
            impl=cfg.TPU.ROI_ALIGN_IMPL)
        B, P, hh, ww, C = pooled.shape
        x = pooled.reshape(B * P, hh, ww, C).astype(self.dtype)
        for block in self.res5:
            x = block(x)
        return x.reshape(B, P, x.shape[1], x.shape[2], x.shape[3])

    def box_forward(self, feats, boxes, valid):
        x = self._res5_features(feats, boxes, valid)
        return self.box_predictor(x.mean(axis=(2, 3)))

    def mask_forward(self, feats, boxes, valid):
        x = self._res5_features(feats, boxes, valid)
        return self.mask_head(x)
