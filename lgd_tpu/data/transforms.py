"""Host-side image/annotation transforms (numpy + cv2).

Equivalents of the detectron2 augmentations the reference's DatasetMapper
applies (utils/dataset_mapper.py:222-225 via detection_utils
.build_augmentation): ResizeShortestEdge with multi-scale 'choice' sampling,
RandomFlip, RandomCrop. These run on the host data path; the device side
sees only fixed padded canvases.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import cv2
import numpy as np


class Transform:
    """A deterministic, invertible-enough record of one applied aug."""

    def apply_image(self, img):  # pragma: no cover - interface
        raise NotImplementedError

    def apply_coords(self, coords):  # (N, 2)
        raise NotImplementedError

    def apply_box(self, boxes):  # (N, 4) x1y1x2y2
        n = boxes.shape[0]
        if n == 0:
            return boxes
        corners = np.stack(
            [
                boxes[:, [0, 1]], boxes[:, [2, 1]],
                boxes[:, [0, 3]], boxes[:, [2, 3]],
            ],
            axis=1,
        ).reshape(-1, 2)
        corners = self.apply_coords(corners).reshape(n, 4, 2)
        mins = corners.min(axis=1)
        maxs = corners.max(axis=1)
        return np.concatenate([mins, maxs], axis=1).astype(np.float32)

    def apply_polygons(self, polygons):
        return [
            self.apply_coords(np.asarray(p, np.float64).reshape(-1, 2))
            .reshape(-1)
            for p in polygons
        ]


class ResizeTransform(Transform):
    def __init__(self, h, w, new_h, new_w):
        self.h, self.w, self.new_h, self.new_w = h, w, new_h, new_w

    def apply_image(self, img):
        return cv2.resize(
            img, (self.new_w, self.new_h), interpolation=cv2.INTER_LINEAR
        )

    def apply_coords(self, coords):
        coords = coords.astype(np.float64).copy()
        coords[:, 0] *= self.new_w / self.w
        coords[:, 1] *= self.new_h / self.h
        return coords


class HFlipTransform(Transform):
    def __init__(self, width):
        self.width = width

    def apply_image(self, img):
        return np.ascontiguousarray(img[:, ::-1])

    def apply_coords(self, coords):
        coords = coords.astype(np.float64).copy()
        coords[:, 0] = self.width - coords[:, 0]
        return coords


class CropTransform(Transform):
    def __init__(self, x0, y0, w, h):
        self.x0, self.y0, self.w, self.h = x0, y0, w, h

    def apply_image(self, img):
        return img[self.y0 : self.y0 + self.h, self.x0 : self.x0 + self.w]

    def apply_coords(self, coords):
        coords = coords.astype(np.float64).copy()
        coords[:, 0] -= self.x0
        coords[:, 1] -= self.y0
        return coords


class NoOpTransform(Transform):
    def apply_image(self, img):
        return img

    def apply_coords(self, coords):
        return coords


class ResizeShortestEdge:
    """Resize shortest edge to a sampled target, cap longest at max_size
    (detectron2 semantics; INPUT.MIN_SIZE_TRAIN 640..800 multi-scale)."""

    def __init__(self, short_edge_lengths, max_size: int,
                 sample_style: str = "choice"):
        if isinstance(short_edge_lengths, int):
            short_edge_lengths = (short_edge_lengths,)
        self.short = tuple(short_edge_lengths)
        self.max_size = max_size
        self.sample_style = sample_style

    def get_transform(self, img, rng: np.random.RandomState) -> Transform:
        h, w = img.shape[:2]
        if self.sample_style == "choice":
            size = self.short[rng.randint(len(self.short))]
        else:  # range
            size = rng.randint(min(self.short), max(self.short) + 1)
        if size == 0:
            return NoOpTransform()
        scale = size / min(h, w)
        if h < w:
            new_h, new_w = size, scale * w
        else:
            new_h, new_w = scale * h, size
        if max(new_h, new_w) > self.max_size:
            s = self.max_size / max(new_h, new_w)
            new_h, new_w = new_h * s, new_w * s
        return ResizeTransform(h, w, int(new_h + 0.5), int(new_w + 0.5))


class RandomFlip:
    def __init__(self, prob: float = 0.5):
        self.prob = prob

    def get_transform(self, img, rng) -> Transform:
        if rng.rand() < self.prob:
            return HFlipTransform(img.shape[1])
        return NoOpTransform()


class RandomCrop:
    """detectron2 RandomCrop types: relative_range / relative / absolute."""

    def __init__(self, crop_type: str, crop_size):
        self.crop_type = crop_type
        self.crop_size = tuple(crop_size)

    def get_transform(self, img, rng) -> Transform:
        h, w = img.shape[:2]
        if self.crop_type == "relative":
            ch, cw = int(h * self.crop_size[0] + 0.5), int(w * self.crop_size[1] + 0.5)
        elif self.crop_type == "relative_range":
            cs = np.asarray(self.crop_size, np.float32)
            frac = cs + rng.rand(2) * (1 - cs)
            ch, cw = int(h * frac[0] + 0.5), int(w * frac[1] + 0.5)
        elif self.crop_type == "absolute":
            ch, cw = min(self.crop_size[0], h), min(self.crop_size[1], w)
        else:
            raise ValueError(self.crop_type)
        y0 = rng.randint(h - ch + 1)
        x0 = rng.randint(w - cw + 1)
        return CropTransform(x0, y0, cw, ch)


def strong_augment(image: np.ndarray, rng: np.random.RandomState
                   ) -> np.ndarray:
    """SimCLR-style strong augmentation for the reference's STRONGER_AUGS
    path (dataset_mapper.py:212-218,346-349): ColorJitter(0.4,0.4,0.4,0.1)
    p=0.8, grayscale p=0.2, GaussianBlur sigma U(0.1,2) p=0.5. BGR float."""
    img = image.astype(np.float32)
    if rng.rand() < 0.8:
        # brightness / contrast / saturation / hue in random order
        def brightness(x):
            return x * rng.uniform(0.6, 1.4)

        def contrast(x):
            m = x.mean()
            return (x - m) * rng.uniform(0.6, 1.4) + m

        def saturation(x):
            g = x.mean(axis=2, keepdims=True)
            return (x - g) * rng.uniform(0.6, 1.4) + g

        def hue(x):
            hsv = cv2.cvtColor(np.clip(x, 0, 255).astype(np.uint8),
                               cv2.COLOR_BGR2HSV).astype(np.int16)
            hsv[..., 0] = (hsv[..., 0] + int(rng.uniform(-0.1, 0.1) * 180)) % 180
            return cv2.cvtColor(hsv.astype(np.uint8),
                                cv2.COLOR_HSV2BGR).astype(np.float32)

        ops = [brightness, contrast, saturation, hue]
        rng.shuffle(ops)
        for op in ops:
            img = op(img)
    if rng.rand() < 0.2:
        g = img.mean(axis=2, keepdims=True)
        img = np.repeat(g, 3, axis=2)
    if rng.rand() < 0.5:
        sigma = rng.uniform(0.1, 2.0)
        img = cv2.GaussianBlur(img, (0, 0), sigma)
    return np.clip(img, 0, 255)


def build_augmentation(cfg, is_train: bool):
    """detectron2 detection_utils.build_augmentation + the reference's
    optional crop (dataset_mapper.py:222-225,279-281)."""
    augs = []
    if is_train:
        if cfg.INPUT.CROP.ENABLED:
            augs.append(RandomCrop(cfg.INPUT.CROP.TYPE, cfg.INPUT.CROP.SIZE))
        augs.append(
            ResizeShortestEdge(
                tuple(cfg.INPUT.MIN_SIZE_TRAIN), cfg.INPUT.MAX_SIZE_TRAIN,
                cfg.INPUT.MIN_SIZE_TRAIN_SAMPLING,
            )
        )
        if cfg.INPUT.RANDOM_FLIP != "none":
            augs.append(RandomFlip())
    else:
        augs.append(
            ResizeShortestEdge(cfg.INPUT.MIN_SIZE_TEST, cfg.INPUT.MAX_SIZE_TEST)
        )
    return augs


def apply_augmentations(augs, image, rng):
    tfms = []
    for aug in augs:
        t = aug.get_transform(image, rng)
        image = t.apply_image(image)
        tfms.append(t)
    return image, tfms


def transform_boxes(tfms, boxes):
    for t in tfms:
        boxes = t.apply_box(boxes)
    return boxes


def transform_polygons(tfms, polygons):
    for t in tfms:
        polygons = t.apply_polygons(polygons)
    return polygons
