from .adapters import ADAPTERS, build_adapter
from .dynamic_teacher import DynamicTeacher, inside_gt_masks, segmask_inside_masks
from .label_encoder import LabelEncoder, STN, encode_descriptors

__all__ = [
    "ADAPTERS",
    "build_adapter",
    "DynamicTeacher",
    "inside_gt_masks",
    "segmask_inside_masks",
    "LabelEncoder",
    "STN",
    "encode_descriptors",
]
