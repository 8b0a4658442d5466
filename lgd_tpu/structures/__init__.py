from . import boxes
from .boxes import (
    Box2BoxTransform,
    Shift2BoxTransform,
    area,
    clip,
    centers,
    matched_boxlist_iou,
    nonempty,
    pairwise_intersection,
    pairwise_iou,
)
from .instances import BatchedDetections, BatchedInstances, ImageBatch

__all__ = [
    "boxes",
    "Box2BoxTransform",
    "Shift2BoxTransform",
    "area",
    "clip",
    "centers",
    "matched_boxlist_iou",
    "nonempty",
    "pairwise_intersection",
    "pairwise_iou",
    "BatchedDetections",
    "BatchedInstances",
    "ImageBatch",
]
