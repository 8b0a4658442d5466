"""Per-sample mapper: raw dataset dict -> padded-tensor-ready numpy sample.

Equivalent of the reference's DatasetMapper fork
(utils/dataset_mapper.py:136-355): read image (BGR), augment (multi-scale
resize-shortest-edge + flip + optional crop), transform annotations, filter
degenerate boxes, and produce the LGD extras — 7x7 in-box mask descriptors
and stride-aligned rasterized bitmasks when LOAD_LABELMAP (the reference's
label_map/segmask path, dataset_mapper.py:335-339 + teacher utils.py:92-132).
Annotations are kept at eval time because teacher eval needs GT
(dataset_mapper.py:300-304).

Output sample dict (numpy):
    image: (h', w', 3) float32 BGR, resized (NOT yet padded/batched)
    height/width: original size (for eval rescaling)
    image_id, boxes (N, 4) x1y1x2y2 float32, classes (N,) int64,
    masks49 (N, 49) float32 [LOAD_LABELMAP], polygons (list) [LOAD_LABELMAP]
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional

import cv2
import numpy as np

from .transforms import (
    apply_augmentations,
    build_augmentation,
    transform_boxes,
    transform_polygons,
)

logger = logging.getLogger(__name__)


def read_image_bgr(file_name: str) -> np.ndarray:
    img = cv2.imread(file_name, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(file_name)
    return img


def rasterize_polygons(polygons: List[np.ndarray], h: int, w: int
                       ) -> np.ndarray:
    """Polygon list (flattened xy) -> (h, w) uint8 bitmask (cv2.fillPoly;
    replaces pycocotools polygon rasterization)."""
    mask = np.zeros((h, w), np.uint8)
    pts = [
        np.round(np.asarray(p, np.float64).reshape(-1, 2)).astype(np.int32)
        for p in polygons
        if len(p) >= 6
    ]
    if pts:
        cv2.fillPoly(mask, pts, 1)
    return mask


def crop_and_resize_mask(polygons, box, size: int = 7,
                         flatten: bool = True) -> np.ndarray:
    """GT mask cropped to ``box`` and resized to size x size, binarized —
    detectron2 PolygonMasks.crop_and_resize (polygon shift+scale into the
    box frame, then rasterize), used for the 49-d descriptor tail
    (label_encoder.py:61-63) and, at TPU.MASK_CROP_SIZE, for the exact
    GT-frame crops the mask head resamples its targets from."""
    x1, y1, x2, y2 = box
    w = max(x2 - x1, 1e-2)
    h = max(y2 - y1, 1e-2)
    scaled = []
    for p in polygons:
        q = np.asarray(p, np.float64).reshape(-1, 2).copy()
        q[:, 0] = (q[:, 0] - x1) * (size / w)
        q[:, 1] = (q[:, 1] - y1) * (size / h)
        scaled.append(q.reshape(-1))
    m = rasterize_polygons(scaled, size, size).astype(np.float32)
    return m.reshape(-1) if flatten else m


def mask_index_encode(polygons_per_inst, classes, h: int, w: int
                      ) -> np.ndarray:
    """Per-pixel class-index map from instance polygons (the reference's
    label_map extra, dataset_mapper.py:58-79; overlaps resolved by paint
    order like the reference)."""
    out = np.zeros((h, w), np.int64)
    for polys, c in zip(polygons_per_inst, classes):
        m = rasterize_polygons(polys, h, w).astype(bool)
        out[m] = int(c)
    return out


def box_color_encode(boxes, classes, h: int, w: int, num_classes: int,
                     rng: np.random.RandomState, target_noise: bool = True
                     ) -> np.ndarray:
    """Per-class diamond-distance box rendering (the reference's box_map
    extra, dataset_mapper.py:81-110; LOAD_BOXMAP flag). Returns
    (num_classes, h, w) float32."""
    out = np.zeros((num_classes, h, w), np.float32)
    ys, xs = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    for (x0, y0, x1, y1), label in zip(boxes, classes - 1):
        bw, bh = max(x1 - x0, 1e-3), max(y1 - y0, 1e-3)
        cx, cy = (x0 + x1) / 2, (y0 + y1) / 2
        color = 1 - np.maximum(np.abs(xs - cx) / bw, np.abs(ys - cy) / bh)
        inside = color >= 0.5
        if target_noise:
            color = color * inside * min(rng.rand() * 2, 1.0)
        else:
            color = inside.astype(np.float32)
        out[int(label)] = np.maximum(out[int(label)], color)
    return out


def box_mask_encode(boxes, h: int, w: int) -> np.ndarray:
    """Union of in-box diamond regions (the reference's box_mask extra,
    dataset_mapper.py:113-133; LOAD_BOX_MASK flag)."""
    out = np.zeros((h, w), bool)
    ys, xs = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    for x0, y0, x1, y1 in boxes:
        bw, bh = max(x1 - x0, 1e-3), max(y1 - y0, 1e-3)
        cx, cy = (x0 + x1) / 2, (y0 + y1) / 2
        color = 1 - np.maximum(np.abs(xs - cx) / bw, np.abs(ys - cy) / bh)
        out |= color >= 0.5
    return out


class DatasetMapper:
    def __init__(self, cfg, is_train: bool = True):
        self.is_train = is_train
        self.augmentations = build_augmentation(cfg, is_train)
        self.use_instance_mask = cfg.MODEL.MASK_ON
        self.load_labelmap = cfg.MODEL.DISTILLATOR.LABEL_ENCODER.LOAD_LABELMAP
        self.segmask_stride = cfg.TPU.SEGMASK_STRIDE
        self.mask_crop_size = cfg.TPU.MASK_CROP_SIZE
        self.filter_empty = cfg.DATALOADER.FILTER_EMPTY_ANNOTATIONS
        self.stronger_augs = cfg.MODEL.STRONGER_AUGS
        self.load_boxmap = cfg.MODEL.LOAD_BOXMAP
        self.load_box_mask = cfg.MODEL.LOAD_BOX_MASK
        self.num_classes = cfg.NUM_CLASSES

    def __call__(self, dataset_dict: Dict, rng: np.random.RandomState
                 ) -> Optional[Dict]:
        d = dict(dataset_dict)
        image = read_image_bgr(d["file_name"]) if "file_name" in d else d["image"]
        image, tfms = apply_augmentations(self.augmentations, image, rng)
        h, w = image.shape[:2]

        annos = [a for a in d.get("annotations", [])
                 if a.get("iscrowd", 0) == 0]
        boxes = np.zeros((0, 4), np.float32)
        classes = np.zeros((0,), np.int64)
        polygons: List[List[np.ndarray]] = []
        if annos:
            raw = np.asarray([a["bbox"] for a in annos], np.float32)
            # XYWH -> XYXY
            boxes = np.concatenate([raw[:, :2], raw[:, :2] + raw[:, 2:]], axis=1)
            boxes = transform_boxes(tfms, boxes)
            boxes[:, 0::2] = boxes[:, 0::2].clip(0, w)
            boxes[:, 1::2] = boxes[:, 1::2].clip(0, h)
            classes = np.asarray([a["category_id"] for a in annos], np.int64)
            if self.load_labelmap or self.use_instance_mask:
                polygons = [
                    transform_polygons(tfms, a.get("segmentation", []))
                    for a in annos
                ]
            # filter degenerate (detectron2 filter_empty_instances)
            keep = (boxes[:, 2] > boxes[:, 0] + 1e-3) & (
                boxes[:, 3] > boxes[:, 1] + 1e-3
            )
            boxes, classes = boxes[keep], classes[keep]
            polygons = [p for p, k in zip(polygons, keep) if k] if polygons else []

        if self.is_train and self.filter_empty and len(boxes) == 0:
            return None  # caller resamples

        sample = {
            "image": image.astype(np.float32),
            "height": d.get("height", h),
            "width": d.get("width", w),
            "image_id": d.get("image_id", -1),
            "boxes": boxes,
            "classes": classes,
        }
        if self.stronger_augs and self.is_train:
            from .transforms import strong_augment

            sample["extra_image"] = strong_augment(image, rng)
        if self.load_boxmap:
            sample["box_map"] = box_color_encode(
                boxes, classes, h, w, self.num_classes, rng)
        if self.load_box_mask:
            sample["box_mask"] = box_mask_encode(boxes, h, w)
        if self.load_labelmap:
            sample["masks49"] = (
                np.stack([
                    crop_and_resize_mask(p, b) for p, b in zip(polygons, boxes)
                ]) if len(boxes) else np.zeros((0, 49), np.float32)
            )
            sample["polygons"] = polygons
        if self.use_instance_mask and self.is_train:
            # exact GT-box-frame crops at 2x the mask-head target res; the
            # device resamples these onto each proposal's 28x28 grid
            # (detectron2 crop_and_resize(proposal_boxes, 28) equivalent,
            # sub-pixel at typical object scales)
            G = self.mask_crop_size
            sample["mask_crops"] = (
                np.stack([
                    crop_and_resize_mask(p, b, size=G, flatten=False)
                    for p, b in zip(polygons, boxes)
                ]).astype(np.uint8) if len(boxes)
                else np.zeros((0, G, G), np.uint8)
            )
        return sample
