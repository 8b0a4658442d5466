"""Synthetic mini-COCO fixture (BASELINE.json config #1: "16-image COCO mini
split, CPU-runnable"). Deterministic random images with geometric objects and
matching GT boxes/classes/masks, already in the padded batch layout the
jitted train step consumes. No real COCO data is mounted in this container,
so this fixture is the end-to-end train/eval substrate for tests and bench.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from ..structures import BatchedInstances


def make_synthetic_dataset_dicts(num_images: int = 16, seed: int = 0,
                                 num_classes: int = 80,
                                 max_hw: Tuple[int, int] = (480, 640)):
    """In-memory dataset dicts (same schema as load_coco_json) with random
    geometric objects — the 16-image mini-split stand-in."""
    rng = np.random.RandomState(seed)
    dicts = []
    for i in range(num_images):
        h = int(rng.randint(max_hw[0] // 2, max_hw[0] + 1))
        w = int(rng.randint(max_hw[1] // 2, max_hw[1] + 1))
        img = rng.uniform(0, 255, (h, w, 3)).astype(np.float32)
        n = int(rng.randint(1, 7))
        annos = []
        for _ in range(n):
            bw = rng.uniform(0.1, 0.5) * w
            bh = rng.uniform(0.1, 0.5) * h
            x1 = rng.uniform(0, w - bw)
            y1 = rng.uniform(0, h - bh)
            c = int(rng.randint(0, num_classes))
            img[int(y1): int(y1 + bh), int(x1): int(x1 + bw)] = (
                (c * 37) % 255, (c * 91) % 255, (c * 13) % 255)
            annos.append({
                "bbox": [float(x1), float(y1), float(bw), float(bh)],
                "bbox_mode": "XYWH_ABS",
                "category_id": c,
                "iscrowd": 0,
                "segmentation": [[x1, y1, x1 + bw, y1, x1 + bw, y1 + bh,
                                  x1, y1 + bh]],
            })
        dicts.append({
            "image": img,
            "height": h,
            "width": w,
            "image_id": i + 1,
            "annotations": annos,
        })
    return dicts


def register_synthetic(name: str = "synthetic_mini", num_images: int = 16,
                       seed: int = 0, num_classes: int = 80):
    """Register the mini split in the DatasetCatalog (idempotent)."""
    from .catalog import DatasetCatalog, MetadataCatalog

    try:
        DatasetCatalog.register(
            name, lambda: make_synthetic_dataset_dicts(
                num_images, seed, num_classes=num_classes))
    except KeyError:
        return name
    MetadataCatalog.get(name).update(evaluator_type="coco")
    return name


def make_synthetic_batch(
    batch_size: int = 2,
    canvas_hw: Tuple[int, int] = (256, 256),
    max_instances: int = 16,
    num_classes: int = 80,
    seed: int = 0,
    with_masks: bool = False,
    segmask_stride: int = 8,
) -> Dict:
    """Returns {'image': (B,H,W,3) f32 BGR 0-255, 'image_size': (B,2) i32,
    'gt': BatchedInstances} with 1..6 axis-aligned rectangles per image."""
    rng = np.random.RandomState(seed)
    H, W = canvas_hw
    images = rng.uniform(0, 255, (batch_size, H, W, 3)).astype(np.float32)
    image_sizes = np.zeros((batch_size, 2), np.int32)
    boxes_list, classes_list, bitmask_list = [], [], []
    for b in range(batch_size):
        h = rng.randint(int(H * 0.7), H + 1)
        w = rng.randint(int(W * 0.7), W + 1)
        image_sizes[b] = (h, w)
        images[b, h:, :, :] = 0.0
        images[b, :, w:, :] = 0.0
        n = rng.randint(1, 7)
        boxes = []
        for _ in range(n):
            bw = rng.uniform(0.1, 0.5) * w
            bh = rng.uniform(0.1, 0.5) * h
            x1 = rng.uniform(0, w - bw)
            y1 = rng.uniform(0, h - bh)
            boxes.append([x1, y1, x1 + bw, y1 + bh])
        boxes = np.asarray(boxes, np.float32)
        classes = rng.randint(0, num_classes, (n,))
        # paint the objects so appearance correlates with labels
        for (x1, y1, x2, y2), c in zip(boxes, classes):
            images[b, int(y1) : int(y2), int(x1) : int(x2)] = (
                (c * 37) % 255,
                (c * 91) % 255,
                (c * 13) % 255,
            )
        boxes_list.append(boxes)
        classes_list.append(classes)
        if with_masks:
            hs, ws = H // segmask_stride, W // segmask_stride
            bm = np.zeros((n, hs, ws), np.uint8)
            for i, (x1, y1, x2, y2) in enumerate(boxes):
                bm[
                    i,
                    int(y1) // segmask_stride : max(int(y2) // segmask_stride, int(y1) // segmask_stride + 1),
                    int(x1) // segmask_stride : max(int(x2) // segmask_stride, int(x1) // segmask_stride + 1),
                ] = 1
            bitmask_list.append(bm)

    gt = BatchedInstances.from_lists(
        boxes_list,
        classes_list,
        capacity=max_instances,
        masks49_list=(
            [np.ones((len(b), 49), np.float32) for b in boxes_list]
            if with_masks else None
        ),
        bitmasks_list=bitmask_list if with_masks else None,
        # synthetic objects fill their GT box -> exact crop = all ones
        mask_crops_list=(
            [np.ones((len(b), 56, 56), np.uint8) for b in boxes_list]
            if with_masks else None
        ),
    )
    import jax.numpy as jnp

    return {
        "image": jnp.asarray(images),
        "image_size": jnp.asarray(image_sizes),
        "gt": gt,
    }
