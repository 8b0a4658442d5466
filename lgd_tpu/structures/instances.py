"""Padded, shape-static instance containers (pytrees).

The reference keeps per-image ragged ``Instances`` lists (detectron2
structures, SURVEY.md L1). On TPU everything must be shape-static, so GT
annotations live in fixed-capacity struct-of-arrays with validity masks:

    boxes   : (B, M, 4) float32, x1y1x2y2 in the padded input-image frame
    classes : (B, M)    int32, category index in [0, K)
    valid   : (B, M)    bool, True for real instances
    masks49 : (B, M, 49) optional 7x7 in-box bitmask (Mask R-CNN labelmap path)
    bitmasks: (B, M, Hs, Ws) optional rasterized segmentation at stride
              TPU.SEGMASK_STRIDE (source for per-level inside-GT masks)
    mask_crops: (B, M, G, G) optional exact polygon raster in the GT-box
              frame at G = TPU.MASK_CROP_SIZE (mask-head target source)

Registered as a pytree so it flows through jit/shard_map/grad unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BatchedInstances:
    boxes: jax.Array          # (B, M, 4)
    classes: jax.Array        # (B, M) int32
    valid: jax.Array          # (B, M) bool
    masks49: Optional[jax.Array] = None    # (B, M, 49)
    bitmasks: Optional[jax.Array] = None   # (B, M, Hs, Ws) uint8/bool
    mask_crops: Optional[jax.Array] = None  # (B, M, G, G) uint8

    @property
    def capacity(self) -> int:
        return self.boxes.shape[-2]

    @property
    def batch_size(self) -> int:
        return self.boxes.shape[0]

    def num_instances(self):
        """(B,) int32 count of valid instances per image."""
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)

    @staticmethod
    def from_lists(boxes_list, classes_list, capacity: int,
                   masks49_list=None, bitmasks_list=None,
                   mask_crops_list=None):
        """Host-side packing of per-image ragged numpy annotations into the
        padded layout. Truncates images with more than ``capacity`` boxes
        (COCO max is 93; default capacity 100)."""
        B = len(boxes_list)
        boxes = np.zeros((B, capacity, 4), np.float32)
        classes = np.zeros((B, capacity), np.int32)
        valid = np.zeros((B, capacity), bool)
        masks49 = None
        bitmasks = None
        mask_crops = None
        if masks49_list is not None:
            masks49 = np.zeros((B, capacity, 49), np.float32)
        if bitmasks_list is not None:
            hs, ws = 0, 0
            for bm in bitmasks_list:
                if bm is not None and len(bm):
                    hs = max(hs, bm.shape[1])
                    ws = max(ws, bm.shape[2])
            bitmasks = np.zeros((B, capacity, hs, ws), np.uint8) if hs else None
        if mask_crops_list is not None:
            g = 0
            for mc in mask_crops_list:
                if mc is not None and len(mc):
                    g = max(g, mc.shape[1])
            mask_crops = (np.zeros((B, capacity, g, g), np.uint8)
                          if g else None)
        for i, (bx, cl) in enumerate(zip(boxes_list, classes_list)):
            n = min(len(bx), capacity)
            if n:
                boxes[i, :n] = np.asarray(bx, np.float32)[:n]
                classes[i, :n] = np.asarray(cl, np.int32)[:n]
                valid[i, :n] = True
                if masks49 is not None and masks49_list[i] is not None:
                    masks49[i, :n] = np.asarray(masks49_list[i], np.float32)[:n]
                if bitmasks is not None and bitmasks_list[i] is not None:
                    bm = np.asarray(bitmasks_list[i], np.uint8)[:n]
                    bitmasks[i, :n, : bm.shape[1], : bm.shape[2]] = bm
                if mask_crops is not None and mask_crops_list[i] is not None:
                    mc = np.asarray(mask_crops_list[i], np.uint8)[:n]
                    if len(mc):
                        mask_crops[i, :n] = mc
        return BatchedInstances(
            boxes=jnp.asarray(boxes),
            classes=jnp.asarray(classes),
            valid=jnp.asarray(valid),
            masks49=None if masks49 is None else jnp.asarray(masks49),
            bitmasks=None if bitmasks is None else jnp.asarray(bitmasks),
            mask_crops=None if mask_crops is None else jnp.asarray(mask_crops),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ImageBatch:
    """Padded image batch: the TPU equivalent of detectron2 ``ImageList``
    (reference preprocess_image, thirdparty_heads/fcos.py:400-407).

    tensor      : (B, H, W, C) float32/bf16, normalized, zero-padded (NHWC)
    image_sizes : (B, 2) int32 (h, w) valid extent after resize, before pad
    """

    tensor: jax.Array
    image_sizes: jax.Array

    @property
    def padded_hw(self):
        return self.tensor.shape[1], self.tensor.shape[2]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BatchedDetections:
    """Padded detection results (inference output).

    boxes  : (B, D, 4) in the *input* (resized) image frame
    scores : (B, D)
    classes: (B, D) int32
    valid  : (B, D) bool
    """

    boxes: jax.Array
    scores: jax.Array
    classes: jax.Array
    valid: jax.Array
