from .losses import (
    binary_cross_entropy_with_logits,
    iou_loss,
    masked_sum,
    sigmoid_focal_loss,
    smooth_l1_loss,
)
from .matcher import Matcher
from .nms import batched_nms_mask, nms_mask, topk_detections
from .normalization import group_norm, instance_norm_2d, layer_norm

__all__ = [
    "binary_cross_entropy_with_logits",
    "iou_loss",
    "masked_sum",
    "sigmoid_focal_loss",
    "smooth_l1_loss",
    "Matcher",
    "batched_nms_mask",
    "nms_mask",
    "topk_detections",
    "group_norm",
    "instance_norm_2d",
    "layer_norm",
]
