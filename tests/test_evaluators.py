"""Protocol tests for the non-COCO evaluators + get_evaluator routing
(reference get_evaluator surface, train.py:78-127)."""

import numpy as np

from lgd_tpu.evaluation import (
    DatasetEvaluators,
    LVISEvaluator,
    PascalVOCDetectionEvaluator,
    SemSegEvaluator,
    get_evaluator,
)
from lgd_tpu.evaluation.voc_eval import voc_ap


# --------------------------------------------------------------------------
# VOC
# --------------------------------------------------------------------------

def test_voc_ap_11point_hand_computed():
    # PR points: rec [0.5, 1.0], prec [1.0, 2/3]
    rec = np.asarray([0.5, 1.0])
    prec = np.asarray([1.0, 2.0 / 3.0])
    # 11-point: t in {0,...,0.5} -> max prec over rec>=t = 1.0 (6 points);
    # t in {0.6..1.0} -> 2/3 (5 points)
    want = (6 * 1.0 + 5 * 2 / 3) / 11
    assert abs(voc_ap(rec, prec, True) - want) < 1e-9
    # every-point: area = 0.5*1.0 + 0.5*(2/3)
    want12 = 0.5 * 1.0 + 0.5 * 2 / 3
    assert abs(voc_ap(rec, prec, False) - want12) < 1e-9


def _voc_fixture():
    gt = [
        {"image_id": "a", "annotations": [
            {"category_id": 0, "bbox": [0, 0, 10, 10],
             "bbox_mode": "XYXY_ABS"},
            {"category_id": 0, "bbox": [50, 50, 70, 70],
             "bbox_mode": "XYXY_ABS"},
        ]},
        {"image_id": "b", "annotations": [
            {"category_id": 0, "bbox": [5, 5, 25, 25],
             "bbox_mode": "XYXY_ABS", "difficult": True},
        ]},
    ]
    return PascalVOCDetectionEvaluator(gt_dataset=gt, num_classes=1)


def test_voc_protocol_difficult_and_duplicates():
    ev = _voc_fixture()
    # hits gt0 (score .9), duplicate on gt0 (.8 -> FP), hits gt1 (.7),
    # det on the difficult box (.6 -> ignored), miss (.5 -> FP)
    ev.process("a", [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 70, 70]],
               [0.9, 0.8, 0.7], [0, 0, 0])
    ev.process("b", [[5, 5, 25, 25], [200, 200, 210, 210]],
               [0.6, 0.5], [0, 0])
    ap50 = ev.evaluate()["bbox"]["AP50"]
    # ranked: TP FP TP (ignored) FP over npos=2:
    # prec at TPs: 1/1, 2/3 ; rec 0.5, 1.0 -> the hand case above
    want = (6 * 1.0 + 5 * 2 / 3) / 11 * 100
    assert abs(ap50 - want) < 1e-6, (ap50, want)


def test_voc_loader_parses_xml(tmp_path):
    from lgd_tpu.data.voc import load_voc_instances

    d = tmp_path / "VOC2007"
    (d / "Annotations").mkdir(parents=True)
    (d / "ImageSets" / "Main").mkdir(parents=True)
    (d / "JPEGImages").mkdir()
    (d / "ImageSets" / "Main" / "test.txt").write_text("000001\n")
    (d / "Annotations" / "000001.xml").write_text(
        "<annotation><size><width>353</width><height>500</height>"
        "<depth>3</depth></size>"
        "<object><name>dog</name><difficult>0</difficult>"
        "<bndbox><xmin>48</xmin><ymin>240</ymin><xmax>195</xmax>"
        "<ymax>371</ymax></bndbox></object>"
        "<object><name>person</name><difficult>1</difficult>"
        "<bndbox><xmin>8</xmin><ymin>12</ymin><xmax>352</xmax>"
        "<ymax>498</ymax></bndbox></object></annotation>")
    dicts = load_voc_instances(str(d), "test")
    assert len(dicts) == 1
    annos = dicts[0]["annotations"]
    assert len(annos) == 2
    assert annos[0]["bbox"] == [47.0, 239.0, 195.0, 371.0]  # 1-based -> 0
    assert annos[1]["difficult"] is True
    assert dicts[0]["height"] == 500


# --------------------------------------------------------------------------
# SemSeg
# --------------------------------------------------------------------------

def test_sem_seg_metrics_hand_computed():
    ev = SemSegEvaluator(num_classes=3, ignore_label=255)
    gt = np.asarray([[0, 0, 1, 1], [2, 2, 255, 255]])
    pred = np.asarray([[0, 1, 1, 1], [2, 0, 0, 0]])
    ev.process(pred, gt)
    r = ev.evaluate()["sem_seg"]
    # conf: (0,0)=1 (0,1)=1 (1,1)=2 (2,2)=1 (2,0)=1
    # class0: tp=1 gt=2 pred=2 -> iou 1/3; class1: tp=2 gt=2 pred=3 -> 2/3;
    # class2: tp=1 gt=2 pred=1 -> 1/2
    assert abs(r["mIoU"] - 100 * (1 / 3 + 2 / 3 + 0.5) / 3) < 1e-6
    assert abs(r["mACC"] - 100 * (0.5 + 1.0 + 0.5) / 3) < 1e-6
    assert abs(r["pACC"] - 100 * 4 / 6) < 1e-6
    # fwIoU: weights 2/6 each -> same as mIoU here
    assert abs(r["fwIoU"] - r["mIoU"]) < 1e-6


# --------------------------------------------------------------------------
# LVIS
# --------------------------------------------------------------------------

def _one_box_gt(img_id, cat, neg=()):
    return {"image_id": img_id,
            "neg_category_ids": list(neg),
            "annotations": [{"category_id": cat, "bbox": [0, 0, 10, 10],
                             "iscrowd": 0}]}


def test_lvis_federated_skips_unannotated_images():
    # img 1: GT of cat0. img 2: no GT of cat0, cat0 NOT in neg ids ->
    # a false det there must NOT count as FP (skipped).
    gt = [_one_box_gt(1, 0), _one_box_gt(2, 1)]
    ev = LVISEvaluator(gt_dataset=gt, num_classes=1)
    ev.process(1, np.asarray([[0, 0, 10, 10]]), [0.9], [0])
    ev.process(2, np.asarray([[0, 0, 10, 10]]), [0.95], [0])  # stray det
    ap = ev.evaluate()["bbox"]["AP"]
    assert abs(ap - 100.0) < 1e-6, ap  # the stray FP was ignored

    # same but cat0 IS negatively annotated on img 2 -> the det counts
    gt2 = [_one_box_gt(1, 0), _one_box_gt(2, 1, neg=(0,))]
    ev2 = LVISEvaluator(gt_dataset=gt2, num_classes=1)
    ev2.process(1, np.asarray([[0, 0, 10, 10]]), [0.9], [0])
    ev2.process(2, np.asarray([[0, 0, 10, 10]]), [0.95], [0])
    ap2 = ev2.evaluate()["bbox"]["AP"]
    assert ap2 < 99.0, ap2  # higher-scored FP drags precision down


def test_lvis_max_dets_300():
    ev = LVISEvaluator(gt_dataset=[_one_box_gt(1, 0)], num_classes=1)
    assert ev.max_dets == 300
    assert "AR@300" in ev.evaluate()["bbox"]


# --------------------------------------------------------------------------
# routing
# --------------------------------------------------------------------------

def test_get_evaluator_routes_on_metadata():
    from lgd_tpu.config import get_cfg
    from lgd_tpu.data.catalog import DatasetCatalog, MetadataCatalog

    cfg = get_cfg()
    for name, etype, cls in [
        ("_t_coco", "coco", "COCOEvaluator"),
        ("_t_voc", "pascal_voc", "PascalVOCDetectionEvaluator"),
        ("_t_lvis", "lvis", "LVISEvaluator"),
        ("_t_city", "cityscapes_instance", "CityscapesInstanceEvaluator"),
    ]:
        try:
            DatasetCatalog.register(name, lambda: [])
        except KeyError:
            pass
        MetadataCatalog.get(name).update(evaluator_type=etype)
        ev = get_evaluator(cfg, name)
        assert type(ev).__name__ == cls, (name, type(ev).__name__)


def test_dataset_evaluators_combine():
    a = SemSegEvaluator(num_classes=2)
    b = SemSegEvaluator(num_classes=2)
    both = DatasetEvaluators([a, b])
    both.reset()
    both.process(np.zeros((2, 2), int), np.zeros((2, 2), int))
    assert a._conf.sum() == b._conf.sum() == 4
