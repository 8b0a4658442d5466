"""Data pipeline tests: synthetic COCO json -> catalog -> mapper -> padded
batches (the reference's L2 layer, SURVEY.md §3.4)."""

import json
import os

import numpy as np
import pytest

from lgd_tpu.config import get_cfg
from lgd_tpu.data import (
    DatasetCatalog,
    DatasetMapper,
    TrainingSampler,
    TrainLoader,
    load_coco_json,
    pack_batch,
)
from lgd_tpu.data.transforms import (
    HFlipTransform,
    ResizeShortestEdge,
    ResizeTransform,
)


@pytest.fixture(scope="module")
def mini_coco(tmp_path_factory):
    """Write a tiny on-disk COCO dataset (images + json)."""
    import cv2

    root = tmp_path_factory.mktemp("minicoco")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    images, annotations = [], []
    ann_id = 1
    for i in range(6):
        h, w = int(rng.randint(240, 480)), int(rng.randint(240, 640))
        img = rng.randint(0, 255, (h, w, 3), np.uint8)
        fname = f"{i:06d}.jpg"
        cv2.imwrite(str(img_dir / fname), img)
        images.append({"id": i + 1, "file_name": fname, "height": h, "width": w})
        for _ in range(rng.randint(1, 4)):
            bw, bh = rng.randint(20, w // 2), rng.randint(20, h // 2)
            x, y = rng.randint(0, w - bw), rng.randint(0, h - bh)
            annotations.append({
                "id": ann_id, "image_id": i + 1,
                "bbox": [float(x), float(y), float(bw), float(bh)],
                "category_id": int(rng.choice([1, 2, 18])),
                "iscrowd": 0, "area": float(bw * bh),
                "segmentation": [[x, y, x + bw, y, x + bw, y + bh, x, y + bh]],
            })
            ann_id += 1
    cats = [{"id": 1, "name": "person"}, {"id": 2, "name": "bicycle"},
            {"id": 18, "name": "dog"}]
    js = root / "ann.json"
    js.write_text(json.dumps(
        {"images": images, "annotations": annotations, "categories": cats}))
    return str(js), str(img_dir)


def test_load_coco_json(mini_coco):
    js, img_dir = mini_coco
    dicts = load_coco_json(js, img_dir, None)
    assert len(dicts) == 6
    d = dicts[0]
    assert os.path.exists(d["file_name"])
    # contiguous remap: ids {1,2,18} -> {0,1,2}
    cids = {a["category_id"] for dd in dicts for a in dd["annotations"]}
    assert cids <= {0, 1, 2}


def test_resize_shortest_edge_multiscale():
    rng = np.random.RandomState(0)
    aug = ResizeShortestEdge((640, 672, 704), max_size=1333)
    img = np.zeros((480, 640, 3), np.float32)
    t = aug.get_transform(img, rng)
    assert isinstance(t, ResizeTransform)
    out = t.apply_image(img)
    assert min(out.shape[:2]) in (640, 672, 704)
    assert max(out.shape[:2]) <= 1333
    # box transform consistency
    box = np.array([[10.0, 20.0, 100.0, 200.0]])
    tb = t.apply_box(box)
    sx, sy = out.shape[1] / 640, out.shape[0] / 480
    np.testing.assert_allclose(tb[0], box[0] * [sx, sy, sx, sy], rtol=1e-5)


def test_hflip_boxes():
    t = HFlipTransform(width=100)
    box = np.array([[10.0, 5.0, 30.0, 25.0]])
    np.testing.assert_allclose(t.apply_box(box)[0], [70.0, 5.0, 90.0, 25.0])


def test_mapper_and_pack(mini_coco):
    js, img_dir = mini_coco
    dicts = load_coco_json(js, img_dir, None)
    cfg = get_cfg()
    cfg.INPUT.MIN_SIZE_TRAIN = (320,)
    cfg.INPUT.MAX_SIZE_TRAIN = 512
    cfg.TPU.MAX_INSTANCES = 10
    mapper = DatasetMapper(cfg, is_train=True)
    rng = np.random.RandomState(1)
    samples = [mapper(d, rng) for d in dicts[:4]]
    samples = [s for s in samples if s is not None]
    assert len(samples) >= 2
    batch = pack_batch(samples, (512, 512), 10)
    assert batch["image"].shape == (len(samples), 512, 512, 3)
    assert batch["gt"].boxes.shape == (len(samples), 10, 4)
    # boxes stay inside the declared image sizes
    for i in range(len(samples)):
        h, w = np.asarray(batch["image_size"][i])
        valid = np.asarray(batch["gt"].valid[i])
        bx = np.asarray(batch["gt"].boxes[i])[valid]
        assert (bx[:, 2] <= w + 1e-3).all() and (bx[:, 3] <= h + 1e-3).all()


def test_training_sampler_sharding():
    s0 = list(TrainingSampler(10, seed=7, rank=0, world_size=2).__iter__().__next__() for _ in range(1))
    # deterministic, disjoint shards per rank covering all indices
    it0 = iter(TrainingSampler(10, seed=7, rank=0, world_size=2))
    it1 = iter(TrainingSampler(10, seed=7, rank=1, world_size=2))
    first0 = [next(it0) for _ in range(5)]
    first1 = [next(it1) for _ in range(5)]
    assert sorted(first0 + first1) == list(range(10))


def test_train_loader_end_to_end(mini_coco):
    js, img_dir = mini_coco
    name = "mini_coco_loader_test"
    try:
        DatasetCatalog.register(
            name, lambda: load_coco_json(js, img_dir, None))
    except KeyError:
        pass
    cfg = get_cfg()
    cfg.DATASETS.TRAIN = (name,)
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.INPUT.MIN_SIZE_TRAIN = (320,)
    cfg.INPUT.MAX_SIZE_TRAIN = 512
    cfg.TPU.MAX_INSTANCES = 10
    loader = TrainLoader(cfg)
    it = iter(loader)
    b1 = next(it)
    b2 = next(it)
    for b in (b1, b2):
        assert b["image"].ndim == 4 and b["image"].shape[0] == 2
        # canvas is one of the two aspect buckets: short edge 320 already a
        # multiple of the default TPU.PAD_SIZE_DIVISIBILITY=32
        assert b["image"].shape[1:3] in {(320, 512), (512, 320)}
