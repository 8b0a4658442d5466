"""Shape-static greedy NMS for TPU.

TPU-native replacement for torchvision's ``nms.cu`` / cvpods
``generalized_batched_nms`` (reference use: thirdparty_heads/fcos.py:384-388
and detectron2 RetinaNet/RPN/ROI inference; SURVEY.md §2.3). Candidates are
fixed-capacity padded arrays with validity masks; suppression is an exact
greedy sweep expressed as a ``lax.fori_loop`` over the sorted candidate list
with fully vectorized inner IoU rows (O(N) sequential steps, O(N^2) vector
work — eval-path only, never inside the train step).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..structures import boxes as box_ops

NEG_INF = -1e10


def nms_mask(boxes, scores, valid, iou_threshold: float):
    """Exact greedy NMS.

    Args:
        boxes: (N, 4); scores: (N,); valid: (N,) bool.
    Returns:
        keep: (N,) bool — suppressed/invalid entries are False. Candidates
        are processed in score order (identical result to sorting first).
    """
    n = boxes.shape[0]
    masked_scores = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-masked_scores)
    boxes_s = boxes[order]
    valid_s = masked_scores[order] > NEG_INF

    iou = box_ops.pairwise_iou(boxes_s, boxes_s)  # (N, N)

    def body(i, keep):
        keep_i = keep[i] & valid_s[i]
        suppress = (iou[i] > iou_threshold) & keep_i
        # never suppress self or earlier entries
        idx = jnp.arange(n)
        suppress = suppress & (idx > i)
        return keep & ~suppress

    keep_s = jax.lax.fori_loop(0, n, body, valid_s)

    # scatter back to original order
    keep = jnp.zeros((n,), bool).at[order].set(keep_s)
    return keep


def batched_nms_mask(boxes, scores, classes, valid, iou_threshold: float):
    """Class-aware NMS via the coordinate-offset trick (detectron2
    ``batched_nms`` / cvpods ``generalized_batched_nms`` nms_type='normal')."""
    max_coord = jnp.max(jnp.where(valid[..., None], boxes, 0.0)) + 1.0
    offsets = classes.astype(boxes.dtype) * max_coord
    shifted = boxes + offsets[..., None]
    return nms_mask(shifted, scores, valid, iou_threshold)


def topk_detections(boxes, scores, classes, keep, k: int):
    """Select top-k kept detections into fixed-size padded outputs.

    Returns (boxes (k,4), scores (k,), classes (k,), valid (k,))."""
    masked = jnp.where(keep, scores, NEG_INF)
    top_scores, idx = jax.lax.top_k(masked, k)
    out_valid = top_scores > NEG_INF
    return boxes[idx], jnp.where(out_valid, top_scores, 0.0), classes[idx], out_valid
