"""Padded-batch data loaders (host side).

TPU-first rework of the reference's loader builders (utils/build.py:262-412):
the ragged list-of-dicts batches become fixed-canvas padded tensors so every
train step hits one of two compiled programs (landscape/portrait aspect
buckets — the reference's AspectRatioGroupedDataset, utils/build.py:289-298,
reinterpreted as canvas-shape bucketing). An infinite shared-seed
TrainingSampler shards indices per host; a background thread pipeline maps +
batches ahead of the device.

Canvas shapes: short = ceil(max(MIN_SIZE_TRAIN)/d)*d, long =
ceil(MAX_SIZE_TRAIN/d)*d with d = TPU.PAD_SIZE_DIVISIBILITY; landscape
images pad onto (short, long), portrait onto (long, short).
"""

from __future__ import annotations

import itertools
import logging
import queue
import threading
from typing import Dict, Iterator, List, Optional

import numpy as np

from ..structures import BatchedInstances
from .coco import get_detection_dataset_dicts
from .dataset_mapper import DatasetMapper, rasterize_polygons

logger = logging.getLogger(__name__)


def _ceil_to(x, d):
    return int(-(-x // d) * d)


def train_canvas_shapes(cfg):
    d = cfg.TPU.PAD_SIZE_DIVISIBILITY
    if cfg.TPU.TRAIN_CANVAS:
        h, w = cfg.TPU.TRAIN_CANVAS
        return (int(h), int(w)), (int(w), int(h))
    short = _ceil_to(max(cfg.INPUT.MIN_SIZE_TRAIN), d)
    long_ = _ceil_to(cfg.INPUT.MAX_SIZE_TRAIN, d)
    return (short, long_), (long_, short)  # landscape, portrait


def eval_canvas_shapes(cfg):
    """(landscape, portrait) eval canvases: shortest edge MIN_SIZE_TEST,
    longest capped at MAX_SIZE_TEST — two compiled programs instead of one
    square max-canvas (halves eval compute for typical images)."""
    d = cfg.TPU.PAD_SIZE_DIVISIBILITY
    if cfg.TPU.EVAL_CANVAS:
        h, w = (int(x) for x in cfg.TPU.EVAL_CANVAS)
        return (h, w), (w, h)
    short = _ceil_to(cfg.INPUT.MIN_SIZE_TEST, d)
    long_ = _ceil_to(cfg.INPUT.MAX_SIZE_TEST, d)
    return (short, long_), (long_, short)


class TrainingSampler:
    """Infinite shuffled index stream with a shared seed; each host consumes
    indices[rank::world] (reference TrainingSampler, utils/build.py:351-352)."""

    def __init__(self, size: int, seed: int = 2022, shuffle: bool = True,
                 rank: int = 0, world_size: int = 1):
        self.size = size
        self.seed = seed
        self.shuffle = shuffle
        self.rank = rank
        self.world_size = world_size

    def __iter__(self) -> Iterator[int]:
        g = np.random.RandomState(self.seed)
        while True:
            order = g.permutation(self.size) if self.shuffle else np.arange(self.size)
            yield from order[self.rank :: self.world_size].tolist()


class RepeatFactorTrainingSampler(TrainingSampler):
    """detectron2 RepeatFactorTrainingSampler (referenced by
    DATALOADER.SAMPLER_TRAIN; utils/build.py:26): images are repeated by
    ceil-with-stochastic-fraction of max_c sqrt(t / f(c)) over their
    categories, where f(c) is the category image frequency."""

    def __init__(self, dataset_dicts, repeat_thresh: float, seed: int = 2022,
                 shuffle: bool = True, rank: int = 0, world_size: int = 1):
        super().__init__(len(dataset_dicts), seed, shuffle, rank, world_size)
        from collections import Counter

        freq = Counter()
        n = len(dataset_dicts)
        cats_per_img = []
        for d in dataset_dicts:
            cats = {a["category_id"] for a in d.get("annotations", [])
                    if a.get("iscrowd", 0) == 0}
            cats_per_img.append(cats)
            freq.update(cats)
        cat_rep = {
            c: max(1.0, np.sqrt(repeat_thresh / (v / n)))
            for c, v in freq.items()
        }
        self._rep = np.asarray(
            [max([cat_rep[c] for c in cats], default=1.0)
             for cats in cats_per_img]
        )

    def __iter__(self) -> Iterator[int]:
        g = np.random.RandomState(self.seed)
        while True:
            # stochastic rounding of the fractional repeat part per epoch
            rands = g.rand(self.size)
            rep = np.floor(self._rep) + (rands < (self._rep % 1.0))
            indices = np.repeat(np.arange(self.size), rep.astype(np.int64))
            if self.shuffle:
                indices = indices[g.permutation(len(indices))]
            yield from indices[self.rank :: self.world_size].tolist()


def log_class_histogram(dataset_dicts, class_names=None):
    """Startup class-frequency histogram (reference utils/build.py:167-209)."""
    from collections import Counter

    counts = Counter()
    for d in dataset_dicts:
        counts.update(
            a["category_id"] for a in d.get("annotations", [])
            if a.get("iscrowd", 0) == 0
        )
    total = sum(counts.values())
    top = counts.most_common(20)
    rows = "  ".join(
        f"{(class_names[c] if class_names and c < len(class_names) else c)}:{n}"
        for c, n in top
    )
    logger.info("Instance distribution (%d total, top 20): %s", total, rows)


def pack_batch(samples: List[Dict], canvas_hw, max_instances: int,
               segmask_stride: Optional[int] = None) -> Dict:
    """Samples (mapper outputs) -> padded device batch dict."""
    B = len(samples)
    H, W = canvas_hw
    images = np.zeros((B, H, W, 3), np.float32)
    sizes = np.zeros((B, 2), np.int32)
    boxes_list, classes_list, masks49_list, bitmask_list = [], [], [], []
    mask_crops_list = []
    meta = []
    for i, s in enumerate(samples):
        img = s["image"]
        h, w = img.shape[:2]
        if h > H or w > W:  # canvas guard (shouldn't happen with buckets)
            img = img[:H, :W]
            h, w = img.shape[:2]
        images[i, :h, :w] = img
        sizes[i] = (h, w)
        boxes_list.append(s["boxes"])
        classes_list.append(s["classes"])
        masks49_list.append(s.get("masks49"))
        mask_crops_list.append(s.get("mask_crops"))
        if segmask_stride is not None:
            hs, ws = H // segmask_stride, W // segmask_stride
            polys = s.get("polygons") or []
            n = len(s["boxes"])
            bm = np.zeros((n, hs, ws), np.uint8)
            for j, p in enumerate(polys[:n]):
                full = rasterize_polygons(p, h, w)
                # nearest downsample onto the stride grid of the padded canvas
                ys = np.minimum(np.arange(hs) * segmask_stride, h - 1)
                xs = np.minimum(np.arange(ws) * segmask_stride, w - 1)
                sub = full[ys][:, xs]
                sub[ys >= h] = 0
                bm[j] = sub
            bitmask_list.append(bm)
        meta.append({
            "image_id": s.get("image_id", -1),
            "height": s.get("height", h),
            "width": s.get("width", w),
            "input_hw": (h, w),
        })

    use_masks = any(m is not None for m in masks49_list)
    use_crops = any(m is not None for m in mask_crops_list)
    gt = BatchedInstances.from_lists(
        boxes_list, classes_list, capacity=max_instances,
        masks49_list=masks49_list if use_masks else None,
        bitmasks_list=bitmask_list if segmask_stride is not None else None,
        mask_crops_list=mask_crops_list if use_crops else None,
    )
    import jax.numpy as jnp

    return {
        "image": jnp.asarray(images),
        "image_size": jnp.asarray(sizes),
        "gt": gt,
        "_meta": meta,  # host-only; stripped before jit
    }


class TrainLoader:
    """Infinite iterator of padded batches, aspect-bucketed, thread-prefetched."""

    def __init__(self, cfg, dataset_dicts=None, mapper=None, rank: int = 0,
                 world_size: int = 1, local_batch_size: Optional[int] = None):
        self.cfg = cfg
        if dataset_dicts is None:
            dataset_dicts = get_detection_dataset_dicts(
                cfg.DATASETS.TRAIN,
                filter_empty=cfg.DATALOADER.FILTER_EMPTY_ANNOTATIONS,
            )
        self.dataset_dicts = dataset_dicts
        self.mapper = mapper or DatasetMapper(cfg, is_train=True)
        log_class_histogram(dataset_dicts)
        total = cfg.SOLVER.IMS_PER_BATCH
        assert total % world_size == 0, (
            f"IMS_PER_BATCH={total} not divisible by world_size={world_size}"
        )
        self.batch_size = local_batch_size or total // world_size
        seed = cfg.SEED if cfg.SEED > 0 else 2022
        if cfg.DATALOADER.SAMPLER_TRAIN == "RepeatFactorTrainingSampler":
            self.sampler = RepeatFactorTrainingSampler(
                dataset_dicts, cfg.DATALOADER.REPEAT_THRESHOLD, seed=seed,
                rank=rank, world_size=world_size)
        else:
            self.sampler = TrainingSampler(
                len(dataset_dicts), seed=seed, rank=rank,
                world_size=world_size)
        self.canvas_landscape, self.canvas_portrait = train_canvas_shapes(cfg)
        self.max_instances = cfg.TPU.MAX_INSTANCES
        self.segmask_stride = (
            cfg.TPU.SEGMASK_STRIDE
            if cfg.MODEL.DISTILLATOR.LABEL_ENCODER.LOAD_LABELMAP else None
        )
        self.aspect_grouping = cfg.DATALOADER.ASPECT_RATIO_GROUPING
        self.prefetch = cfg.TPU.PREFETCH
        self._rng = np.random.RandomState(
            (cfg.SEED if cfg.SEED > 0 else 2022) * 1000 + rank
        )

    def _sample_stream(self):
        for idx in self.sampler:
            s = self.mapper(self.dataset_dicts[idx], self._rng)
            if s is not None:
                yield s

    def _batch_stream(self):
        buckets: Dict[int, List] = {0: [], 1: []}
        for s in self._sample_stream():
            h, w = s["image"].shape[:2]
            b = 0 if w >= h else 1
            if not self.aspect_grouping:
                b = 0
            buckets[b].append(s)
            if len(buckets[b]) == self.batch_size:
                canvas = (self.canvas_landscape if b == 0
                          else self.canvas_portrait)
                if not self.aspect_grouping:
                    canvas = (max(self.canvas_landscape),) * 2
                yield pack_batch(buckets[b], canvas, self.max_instances,
                                 self.segmask_stride)
                buckets[b] = []

    def __iter__(self):
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            try:
                for b in self._batch_stream():
                    q.put(b)
            except Exception as e:  # surfaced on the consumer side
                q.put(e)
            q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                return
            if isinstance(item, Exception):
                raise item
            yield item


class TestLoader:
    """Eval loader: padded batches of ``batch_size`` images grouped by canvas
    bucket (landscape/portrait), dataset sharded ``rank::world_size``.

    batch_size=1 reproduces the reference test loader exactly
    (utils/build.py:369-412, batch=1 InferenceSampler); batch_size=n_devices
    feeds a data-sharded inference jit so eval parallelizes over the mesh
    (the reference parallelized eval over its 8 GPUs the same way). Partial
    batches are padded with dummy slots whose meta is None — consumers must
    skip those."""

    def __init__(self, cfg, dataset_name: str, mapper=None,
                 batch_size: int = 1, rank: int = 0, world_size: int = 1):
        self.cfg = cfg
        self._all_dicts = get_detection_dataset_dicts([dataset_name],
                                                      filter_empty=False)
        self.rank = rank
        self.world_size = world_size
        self.mapper = mapper or DatasetMapper(cfg, is_train=False)
        self.batch_size = batch_size
        self.canvas_landscape, self.canvas_portrait = eval_canvas_shapes(cfg)
        self.max_instances = cfg.TPU.MAX_INSTANCES
        self.segmask_stride = (
            cfg.TPU.SEGMASK_STRIDE
            if cfg.MODEL.DISTILLATOR.LABEL_ENCODER.LOAD_LABELMAP else None
        )
        self._sched = self._schedule()

    def _schedule(self):
        """Rank-invariant global batch schedule, computed from the dataset
        dicts' width/height metadata (no image reads): a list of
        (bucket, [global indices]) groups of global size
        ``batch_size * world_size``. Every rank derives the identical
        sequence, so in multi-process eval all ranks dispatch the same
        canvas-shaped programs in lockstep (replacing the reference's
        independent per-rank InferenceSampler shards,
        utils/build.py:369-412, which a lockstep SPMD jit cannot use)."""
        gbs = self.batch_size * self.world_size
        buckets = {0: [], 1: []}
        sched = []
        for i, d in enumerate(self._all_dicts):
            b = 0 if d.get("width", 1) >= d.get("height", 0) else 1
            buckets[b].append(i)
            if len(buckets[b]) == gbs:
                sched.append((b, buckets[b]))
                buckets[b] = []
        for b in (0, 1):
            if buckets[b]:
                sched.append((b, buckets[b]))
        return sched

    def __len__(self):
        """Images this rank actually processes (real, non-padding slots)."""
        n = 0
        lbs = self.batch_size
        for _, idxs in self._sched:
            n += len(idxs[self.rank * lbs:(self.rank + 1) * lbs])
        return n

    def _dummy_sample(self):
        return {
            "image": np.zeros((8, 8, 3), np.float32),
            "boxes": np.zeros((0, 4), np.float32),
            "classes": np.zeros((0,), np.int64),
            "image_id": None,
        }

    def _flush(self, bucket_samples, canvas):
        n_real = len(bucket_samples)
        while len(bucket_samples) < self.batch_size:
            bucket_samples.append(self._dummy_sample())
        batch = pack_batch(bucket_samples, canvas, self.max_instances,
                           self.segmask_stride)
        for i in range(n_real, self.batch_size):
            batch["_meta"][i] = None  # padding slot
        return batch

    def __iter__(self):
        rng = np.random.RandomState(0)
        lbs = self.batch_size
        canvases = {0: self.canvas_landscape, 1: self.canvas_portrait}
        for b, idxs in self._sched:
            mine = idxs[self.rank * lbs:(self.rank + 1) * lbs]
            samples = []
            dummies = []
            for i in mine:
                try:
                    s = self.mapper(self._all_dicts[i], rng)
                except OSError as e:  # unreadable image file
                    logger.warning("skipping unreadable eval image %s: %s",
                                   self._all_dicts[i].get("file_name"), e)
                    s = None
                if s is None:  # unreadable image: keep the schedule intact
                    dummies.append(len(samples))
                    s = self._dummy_sample()
                samples.append(s)
            batch = self._flush(samples, canvases[b])
            for i in dummies:
                # unreadable slots must not reach the evaluator (their
                # image_id is None); mark them like padding slots
                batch["_meta"][i] = None
            yield batch
