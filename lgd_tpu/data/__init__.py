from .catalog import DatasetCatalog, MetadataCatalog
from .coco import (
    filter_images_with_only_crowd_annotations,
    get_detection_dataset_dicts,
    load_coco_json,
)
from .dataset_mapper import DatasetMapper
from .loader import TestLoader, TrainingSampler, TrainLoader, pack_batch
from .synthetic import (
    make_synthetic_batch,
    make_synthetic_dataset_dicts,
    register_synthetic,
)

__all__ = [
    "DatasetCatalog",
    "MetadataCatalog",
    "filter_images_with_only_crowd_annotations",
    "get_detection_dataset_dicts",
    "load_coco_json",
    "DatasetMapper",
    "TestLoader",
    "TrainingSampler",
    "TrainLoader",
    "pack_batch",
    "make_synthetic_batch",
]
