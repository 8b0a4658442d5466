"""Loss primitives (jnp; XLA fuses these — no custom kernels needed).

TPU-native equivalents of the CUDA/torchscript loss kernels in the reference
dependency chain (SURVEY.md §2.3): cvpods ``sigmoid_focal_loss_jit``
(thirdparty_heads/fcos.py:146), detectron2 ``smooth_l1_loss``
(RetinaNet), cvpods ``iou_loss`` (fcos.py:155). All take explicit
element masks instead of boolean indexing so shapes stay static.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-7


def sigmoid_focal_loss(logits, targets, alpha: float = 0.25, gamma: float = 2.0):
    """Per-element focal loss (no reduction).

    logits/targets: same shape; targets in {0, 1} (one-hot foreground).
    Matches torchvision/cvpods sigmoid_focal_loss semantics.
    """
    p = jax.nn.sigmoid(logits)
    # numerically stable BCE-with-logits
    ce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    p_t = p * targets + (1.0 - p) * (1.0 - targets)
    loss = ce * (1.0 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
        loss = alpha_t * loss
    return loss


def smooth_l1_loss(pred, target, beta: float):
    """Per-element smooth-L1 (Huber); beta == 0 degenerates to pure L1
    (the reference RetinaNet config sets SMOOTH_L1_LOSS_BETA: 0.0)."""
    if beta < 1e-5:
        return jnp.abs(pred - target)
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def binary_cross_entropy_with_logits(logits, targets):
    return (
        jnp.maximum(logits, 0)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def _ltrb_to_xyxy(d):
    return jnp.concatenate([-d[..., :2], d[..., 2:]], axis=-1)


def iou_loss(
    pred,
    target,
    weight=None,
    box_mode: str = "xyxy",
    loss_type: str = "giou",
    smooth: bool = False,
):
    """Per-element IoU-family regression loss.

    cvpods semantics (used by FCOS/ATSS losses, fcos.py:155-162):
    ltrb deltas are mapped to pseudo-boxes (-l, -t, r, b); loss_type one of
    'iou' (-log iou), 'linear_iou' (1-iou), 'giou' (1-giou). ``weight``
    multiplies per-element (the centerness weighting in FCOS).
    Returns per-element losses; caller masks + reduces.
    """
    if box_mode == "ltrb":
        pred = _ltrb_to_xyxy(pred)
        target = _ltrb_to_xyxy(target)
    elif box_mode != "xyxy":
        raise ValueError(box_mode)

    pred_area = jnp.clip(pred[..., 2] - pred[..., 0], 0) * jnp.clip(
        pred[..., 3] - pred[..., 1], 0
    )
    tgt_area = jnp.clip(target[..., 2] - target[..., 0], 0) * jnp.clip(
        target[..., 3] - target[..., 1], 0
    )

    w_inter = jnp.clip(
        jnp.minimum(pred[..., 2], target[..., 2])
        - jnp.maximum(pred[..., 0], target[..., 0]),
        0,
    )
    h_inter = jnp.clip(
        jnp.minimum(pred[..., 3], target[..., 3])
        - jnp.maximum(pred[..., 1], target[..., 1]),
        0,
    )
    inter = w_inter * h_inter
    union = pred_area + tgt_area - inter
    if smooth:
        ious = (inter + 1.0) / (union + 1.0)
    else:
        ious = inter / jnp.maximum(union, EPS)

    if loss_type == "iou":
        loss = -jnp.log(jnp.maximum(ious, EPS))
    elif loss_type == "linear_iou":
        loss = 1.0 - ious
    elif loss_type == "giou":
        g_w = jnp.maximum(pred[..., 2], target[..., 2]) - jnp.minimum(
            pred[..., 0], target[..., 0]
        )
        g_h = jnp.maximum(pred[..., 3], target[..., 3]) - jnp.minimum(
            pred[..., 1], target[..., 1]
        )
        ac_union = g_w * g_h
        gious = ious - (ac_union - union) / jnp.maximum(ac_union, EPS)
        loss = 1.0 - gious
    else:
        raise ValueError(loss_type)

    if weight is not None:
        loss = loss * weight
    return loss


def masked_sum(x, mask):
    """Sum of x over elements where mask, with static shapes."""
    return jnp.sum(jnp.where(mask, x, 0.0))
