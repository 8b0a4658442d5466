"""Segm evaluation path: mask pasting, region-local mask IoU, and end-to-end
segm AP through the evaluator."""

import numpy as np

from lgd_tpu.evaluation import COCOEvaluator
from lgd_tpu.evaluation.mask_utils import (
    mask_iou_det_gt,
    paste_mask_region,
    polygon_area,
    rasterize_polygons_region,
)


def square_poly(x1, y1, x2, y2):
    return [[x1, y1, x2, y1, x2, y2, x1, y2]]


def test_polygon_area():
    assert abs(polygon_area(square_poly(0, 0, 10, 10)) - 100) < 1e-6


def test_paste_full_mask_fills_box():
    m = np.ones((28, 28), np.float32)
    out = paste_mask_region([10, 10, 30, 30], m, (0, 0, 40, 40))
    # filled exactly inside the box, empty outside
    assert out[15, 15] and out[29, 29]
    assert not out[5, 5] and not out[35, 35]
    area = out.sum()
    assert abs(area - 400) < 60  # ~20x20 box, boundary tolerance


def test_rasterize_region_offset():
    m = rasterize_polygons_region(square_poly(10, 10, 20, 20), (10, 10, 20, 20))
    assert m[0, 0] and m[9, 9]
    assert m.sum() >= 100  # the square covers the region's top-left 10x10


def test_mask_iou_perfect():
    m = np.ones((28, 28), np.float32)
    iou = mask_iou_det_gt([10, 10, 50, 50], m, square_poly(10, 10, 50, 50),
                          gt_crowd=False)
    assert iou > 0.9


def test_mask_iou_half_overlap():
    m = np.ones((28, 28), np.float32)
    # det covers left half of the GT square
    iou = mask_iou_det_gt([0, 0, 50, 100], m, square_poly(0, 0, 100, 100),
                          gt_crowd=False)
    assert 0.4 < iou < 0.6


def test_mask_iou_crowd_is_ioa():
    m = np.ones((28, 28), np.float32)
    # det entirely inside a big crowd region -> IoA ~ 1
    iou = mask_iou_det_gt([10, 10, 20, 20], m, square_poly(0, 0, 100, 100),
                          gt_crowd=True)
    assert iou > 0.9


def test_segm_ap_end_to_end():
    gt = [{
        "image_id": 1,
        "annotations": [{
            "bbox": [10, 10, 40, 40], "category_id": 0, "iscrowd": 0,
            "segmentation": square_poly(10, 10, 50, 50),
        }],
    }]
    ev = COCOEvaluator(gt_dataset=gt, num_classes=1)
    ev.process(1, [[10, 10, 50, 50]], [0.9], [0],
               masks=np.ones((1, 28, 28), np.float32))
    res = ev.evaluate(iou_types=("bbox", "segm"))
    assert res["bbox"]["AP"] == 100.0
    assert res["segm"]["AP"] > 90.0

    # a det whose mask covers only half the GT: bbox AP stays, segm AP50
    # holds but high-IoU thresholds drop
    ev2 = COCOEvaluator(gt_dataset=gt, num_classes=1)
    half = np.zeros((1, 28, 28), np.float32)
    half[0, :, :14] = 1.0
    ev2.process(1, [[10, 10, 50, 50]], [0.9], [0], masks=half)
    res2 = ev2.evaluate(iou_types=("segm",))
    # half mask -> IoU ~0.5: survives the 0.5 threshold but not 0.75
    assert res2["segm"]["AP75"] == 0.0
    assert res2["segm"]["AP"] < res["segm"]["AP"]
