"""Pure-functional box operations (jnp, shape-static, batched).

TPU-native re-implementation of the box math the reference stack uses:
detectron2 ``Boxes``/``pairwise_iou``/``Box2BoxTransform`` and cvpods
``Shift2BoxTransform`` (see /root/reference/models/customized_detectors/
thirdparty_heads/fcos.py:25,100 and SURVEY.md L1). All functions operate on
plain ``(..., 4)`` arrays in x1y1x2y2 format and broadcast over leading dims,
so they vectorize over padded instance slots without ragged control flow.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-7

# Maximum delta for dw/dh in apply_deltas (detectron2 _DEFAULT_SCALE_CLAMP).
SCALE_CLAMP = float(jnp.log(1000.0 / 16))


def area(boxes):
    """Box areas. boxes: (..., 4) -> (...,)."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    return w * h


def clip(boxes, h, w):
    """Clamp boxes to [0, w] x [0, h]. h/w may be scalars or broadcastable."""
    x1 = jnp.clip(boxes[..., 0], 0, w)
    y1 = jnp.clip(boxes[..., 1], 0, h)
    x2 = jnp.clip(boxes[..., 2], 0, w)
    y2 = jnp.clip(boxes[..., 3], 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def nonempty(boxes, threshold: float = 0.0):
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    return (w > threshold) & (h > threshold)


def centers(boxes):
    return jnp.stack(
        [
            (boxes[..., 0] + boxes[..., 2]) * 0.5,
            (boxes[..., 1] + boxes[..., 3]) * 0.5,
        ],
        axis=-1,
    )


def pairwise_intersection(boxes1, boxes2):
    """(..., N, 4) x (..., M, 4) -> (..., N, M) intersection areas."""
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    return wh[..., 0] * wh[..., 1]


def pairwise_iou(boxes1, boxes2):
    """(..., N, 4) x (..., M, 4) -> (..., N, M) IoU. Zero where union is 0."""
    inter = pairwise_intersection(boxes1, boxes2)
    a1 = area(boxes1)[..., :, None]
    a2 = area(boxes2)[..., None, :]
    union = a1 + a2 - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, EPS), 0.0)


def matched_boxlist_iou(boxes1, boxes2):
    """Elementwise IoU of aligned boxes: (..., 4) x (..., 4) -> (...)."""
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area(boxes1) + area(boxes2) - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, EPS), 0.0)


# ---------------------------------------------------------------------------
# Box2BoxTransform (anchor-based; detectron2 semantics used by RetinaNet/RPN/
# R-CNN heads, cited at retinanet.py / frcnn.py use sites in SURVEY.md §2.2)
# ---------------------------------------------------------------------------


class Box2BoxTransform:
    """dx,dy,dw,dh parameterization between source boxes and target boxes."""

    def __init__(self, weights=(1.0, 1.0, 1.0, 1.0), scale_clamp: float = SCALE_CLAMP):
        self.weights = weights
        self.scale_clamp = scale_clamp

    def get_deltas(self, src_boxes, target_boxes):
        """src/target: (..., 4) -> (..., 4) deltas."""
        src_w = src_boxes[..., 2] - src_boxes[..., 0]
        src_h = src_boxes[..., 3] - src_boxes[..., 1]
        src_cx = src_boxes[..., 0] + 0.5 * src_w
        src_cy = src_boxes[..., 1] + 0.5 * src_h

        tgt_w = target_boxes[..., 2] - target_boxes[..., 0]
        tgt_h = target_boxes[..., 3] - target_boxes[..., 1]
        tgt_cx = target_boxes[..., 0] + 0.5 * tgt_w
        tgt_cy = target_boxes[..., 1] + 0.5 * tgt_h

        wx, wy, ww, wh = self.weights
        # guard against degenerate (padded) boxes: clamp sizes; padded slots
        # are always masked out of the loss downstream.
        src_w = jnp.maximum(src_w, EPS)
        src_h = jnp.maximum(src_h, EPS)
        dx = wx * (tgt_cx - src_cx) / src_w
        dy = wy * (tgt_cy - src_cy) / src_h
        dw = ww * jnp.log(jnp.maximum(tgt_w, EPS) / src_w)
        dh = wh * jnp.log(jnp.maximum(tgt_h, EPS) / src_h)
        return jnp.stack([dx, dy, dw, dh], axis=-1)

    def apply_deltas(self, deltas, boxes):
        """deltas: (..., 4), boxes: (..., 4) -> decoded (..., 4)."""
        widths = boxes[..., 2] - boxes[..., 0]
        heights = boxes[..., 3] - boxes[..., 1]
        cx = boxes[..., 0] + 0.5 * widths
        cy = boxes[..., 1] + 0.5 * heights

        wx, wy, ww, wh = self.weights
        dx = deltas[..., 0] / wx
        dy = deltas[..., 1] / wy
        dw = jnp.minimum(deltas[..., 2] / ww, self.scale_clamp)
        dh = jnp.minimum(deltas[..., 3] / wh, self.scale_clamp)

        pred_cx = dx * widths + cx
        pred_cy = dy * heights + cy
        pred_w = jnp.exp(dw) * widths
        pred_h = jnp.exp(dh) * heights
        return jnp.stack(
            [
                pred_cx - 0.5 * pred_w,
                pred_cy - 0.5 * pred_h,
                pred_cx + 0.5 * pred_w,
                pred_cy + 0.5 * pred_h,
            ],
            axis=-1,
        )


# ---------------------------------------------------------------------------
# Shift2BoxTransform (anchor-free; cvpods semantics used by FCOS/ATSS/POTO,
# reference thirdparty_heads/fcos.py:100)
# ---------------------------------------------------------------------------


class Shift2BoxTransform:
    """(l, t, r, b) distances between shift points and box edges."""

    def __init__(self, weights=(1.0, 1.0, 1.0, 1.0)):
        self.weights = jnp.asarray(weights, dtype=jnp.float32)

    def get_deltas(self, shifts, boxes):
        """shifts: (..., 2) xy points; boxes: (..., 4).
        Returns (..., 4) = (l, t, r, b) * weights. Broadcasts."""
        deltas = (
            jnp.concatenate(
                [shifts - boxes[..., :2], boxes[..., 2:] - shifts], axis=-1
            )
            * self.weights
        )
        return deltas

    def apply_deltas(self, deltas, shifts):
        """deltas: (..., 4) ltrb; shifts: (..., 2) -> boxes (..., 4)."""
        d = deltas / self.weights
        return jnp.concatenate(
            [shifts - d[..., :2], shifts + d[..., 2:]], axis=-1
        )
