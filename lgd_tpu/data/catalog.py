"""Dataset/Metadata catalogs + builtin COCO registration.

Equivalent of detectron2's ``DatasetCatalog``/``MetadataCatalog`` and builtin
COCO registration, which the reference's loader builders consume
(utils/build.py:22,212-259). Datasets are looked up under
$DETECTRON2_DATASETS (default ./datasets), same layout as the reference's
``datasets/coco`` (README dataset setup)."""

from __future__ import annotations

import os
from typing import Callable, Dict, List


class _DatasetCatalog:
    def __init__(self):
        self._registry: Dict[str, Callable[[], List[dict]]] = {}

    def register(self, name: str, fn: Callable[[], List[dict]]):
        if name in self._registry:
            raise KeyError(f"Dataset '{name}' already registered")
        self._registry[name] = fn

    def get(self, name: str) -> List[dict]:
        if name not in self._registry:
            raise KeyError(
                f"Dataset '{name}' not registered; have {sorted(self._registry)}"
            )
        return self._registry[name]()

    def list(self):
        return sorted(self._registry)

    def remove(self, name):
        self._registry.pop(name)


class _Metadata(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v


class _MetadataCatalog:
    def __init__(self):
        self._registry: Dict[str, _Metadata] = {}

    def get(self, name: str) -> _Metadata:
        if name not in self._registry:
            self._registry[name] = _Metadata(name=name)
        return self._registry[name]


DatasetCatalog = _DatasetCatalog()
MetadataCatalog = _MetadataCatalog()


# 80 COCO thing classes (contiguous order); category_id mapping is built
# from the json at load time.
def _register_builtin_coco():
    root = os.environ.get("DETECTRON2_DATASETS", "datasets")
    from .coco import load_coco_json

    splits = {
        "coco_2017_train": ("coco/train2017",
                            "coco/annotations/instances_train2017.json"),
        "coco_2017_val": ("coco/val2017",
                          "coco/annotations/instances_val2017.json"),
    }
    for name, (image_dir, json_file) in splits.items():
        jf = os.path.join(root, json_file)
        idir = os.path.join(root, image_dir)
        DatasetCatalog.register(
            name, (lambda jf=jf, idir=idir, name=name:
                   load_coco_json(jf, idir, name))
        )
        MetadataCatalog.get(name).update(
            evaluator_type="coco", json_file=jf, image_root=idir
        )


_register_builtin_coco()


def _register_builtin_voc_lvis():
    root = os.environ.get("DETECTRON2_DATASETS", "datasets")
    from .lvis import register_lvis
    from .voc import register_pascal_voc

    register_pascal_voc(root)
    register_lvis(root)


_register_builtin_voc_lvis()


def _register_builtin_synthetic():
    """16-image synthetic mini split (BASELINE config #1), always available."""

    def _load():
        from .synthetic import make_synthetic_dataset_dicts

        return make_synthetic_dataset_dicts(16, seed=0)

    DatasetCatalog.register("synthetic_mini", _load)
    MetadataCatalog.get("synthetic_mini").update(evaluator_type="coco")


_register_builtin_synthetic()
