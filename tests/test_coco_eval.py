"""Hand-value tests for the self-contained COCO evaluator."""

import numpy as np

from lgd_tpu.evaluation import COCOEvaluator


def _gt(image_id, boxes_xywh, cats, crowd=None):
    crowd = crowd or [0] * len(boxes_xywh)
    return {
        "image_id": image_id,
        "annotations": [
            {"bbox": b, "category_id": c, "iscrowd": cr}
            for b, c, cr in zip(boxes_xywh, cats, crowd)
        ],
    }


def test_perfect_detection_ap_1():
    ev = COCOEvaluator(gt_dataset=[
        _gt(1, [[10, 10, 40, 40], [100, 100, 50, 50]], [0, 1]),
    ], num_classes=2)
    ev.process(1, [[10, 10, 50, 50]], [0.9], [0])
    ev.process(1, [[100, 100, 150, 150]], [0.8], [1])
    res = ev.evaluate()["bbox"]
    assert res["AP"] == 100.0
    assert res["AP50"] == 100.0


def test_miss_halves_ap():
    ev = COCOEvaluator(gt_dataset=[
        _gt(1, [[10, 10, 40, 40], [100, 100, 50, 50]], [0, 0]),
    ], num_classes=1)
    ev.process(1, [[10, 10, 50, 50]], [0.9], [0])
    res = ev.evaluate()["bbox"]
    # recall caps at 0.5 -> 101-pt AP ~ 50.5 (precision 1 up to recall .5)
    assert 49.0 < res["AP"] <= 51.0


def test_false_positive_lowers_precision():
    ev = COCOEvaluator(gt_dataset=[_gt(1, [[10, 10, 40, 40]], [0])],
                       num_classes=1)
    # high-scoring FP first, then the TP
    ev.process(1, [[300, 300, 350, 350], [10, 10, 50, 50]], [0.95, 0.9], [0, 0])
    res = ev.evaluate()["bbox"]
    assert 49.0 < res["AP"] <= 51.0  # precision 0.5 at all recalls


def test_localization_quality_gradient():
    # IoU ~0.6 box: counts at AP50 but not AP75
    ev = COCOEvaluator(gt_dataset=[_gt(1, [[0, 0, 100, 100]], [0])],
                       num_classes=1)
    ev.process(1, [[0, 0, 100, 65]], [0.9], [0])  # IoU = 0.65
    res = ev.evaluate()["bbox"]
    assert res["AP50"] == 100.0
    assert res["AP75"] == 0.0


def test_crowd_gt_is_ignored_not_fp():
    ev = COCOEvaluator(gt_dataset=[
        _gt(1, [[10, 10, 40, 40], [200, 200, 100, 100]], [0, 0], crowd=[0, 1]),
    ], num_classes=1)
    # det on the crowd region should be ignored entirely
    ev.process(1, [[10, 10, 50, 50], [200, 200, 300, 300]], [0.9, 0.85], [0, 0])
    res = ev.evaluate()["bbox"]
    assert res["AP"] == 100.0


def test_duplicate_detection_is_fp():
    ev = COCOEvaluator(gt_dataset=[_gt(1, [[10, 10, 40, 40]], [0])],
                       num_classes=1)
    ev.process(1, [[10, 10, 50, 50], [11, 11, 51, 51]], [0.9, 0.8], [0, 0])
    res = ev.evaluate()["bbox"]
    # 1 TP + 1 FP after it: AP stays 100 only until recall 1.0 reached first
    assert res["AP"] == 100.0  # duplicate comes after full recall
    ev2 = COCOEvaluator(gt_dataset=[_gt(1, [[10, 10, 40, 40]], [0])],
                        num_classes=1)
    ev2.process(1, [[10, 10, 50, 50], [11, 11, 51, 51]], [0.8, 0.9], [0, 0])
    res2 = ev2.evaluate()["bbox"]
    assert res2["AP"] < 100.0  # duplicate scored higher -> precision dip
