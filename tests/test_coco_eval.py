"""COCOeval reimplementation sanity tests on synthetic datasets with known
AP outcomes."""

import json

import numpy as np
import pytest

from detectron_tpu.data.coco_json import COCO
from detectron_tpu.data.coco_eval import COCOeval


def _make_gt(tmp_path, n_imgs=4, boxes_per_img=2):
    images = [
        {"id": i + 1, "width": 200, "height": 150,
         "file_name": "im{}.jpg".format(i + 1)}
        for i in range(n_imgs)
    ]
    cats = [{"id": 1, "name": "thing", "supercategory": "x"},
            {"id": 7, "name": "stuff", "supercategory": "x"}]
    anns = []
    aid = 1
    rng = np.random.RandomState(0)
    for im in images:
        for b in range(boxes_per_img):
            x, y = (float(v) for v in rng.randint(0, 100, 2))
            w, h = (float(v) for v in rng.randint(20, 60, 2))
            anns.append({
                "id": aid, "image_id": im["id"],
                "category_id": 1 if b % 2 == 0 else 7,
                "bbox": [float(x), float(y), float(w), float(h)],
                "area": float(w * h), "iscrowd": 0,
                "segmentation": [[x, y, x + w, y, x + w, y + h, x, y + h]],
            })
            aid += 1
    gt = {"images": images, "categories": cats, "annotations": anns}
    p = tmp_path / "gt.json"
    p.write_text(json.dumps(gt))
    return str(p), anns


def _perfect_dets(anns):
    return [
        {"image_id": a["image_id"], "category_id": a["category_id"],
         "bbox": a["bbox"], "score": 0.9}
        for a in anns
    ]


def test_perfect_detections_ap1(tmp_path):
    gt_path, anns = _make_gt(tmp_path)
    coco = COCO(gt_path)
    dets = _perfect_dets(anns)
    cocoDt = coco.loadRes(dets)
    E = COCOeval(coco, cocoDt, "bbox")
    E.evaluate()
    E.accumulate()
    stats = E.summarize()
    assert stats[0] == pytest.approx(1.0)
    assert stats[1] == pytest.approx(1.0)


def test_no_detections_ap0(tmp_path):
    gt_path, anns = _make_gt(tmp_path)
    coco = COCO(gt_path)
    cocoDt = coco.loadRes([
        {"image_id": 1, "category_id": 1,
         "bbox": [180.0, 140.0, 10.0, 5.0], "score": 0.5}
    ])
    E = COCOeval(coco, cocoDt, "bbox")
    E.evaluate()
    E.accumulate()
    stats = E.summarize()
    assert stats[0] == pytest.approx(0.0, abs=1e-6)


def test_half_detections(tmp_path):
    gt_path, anns = _make_gt(tmp_path, n_imgs=4, boxes_per_img=2)
    coco = COCO(gt_path)
    # Detect only category-1 boxes perfectly; nothing for category 7.
    dets = [d for d in _perfect_dets(anns) if d["category_id"] == 1]
    cocoDt = coco.loadRes(dets)
    E = COCOeval(coco, cocoDt, "bbox")
    E.evaluate()
    E.accumulate()
    stats = E.summarize()
    # Per-category mean: cat1 AP=1, cat7 AP=0 -> mAP 0.5
    assert stats[0] == pytest.approx(0.5, abs=1e-6)


def test_jittered_detections_ap_between(tmp_path):
    gt_path, anns = _make_gt(tmp_path, n_imgs=6, boxes_per_img=2)
    coco = COCO(gt_path)
    dets = []
    for a in anns:
        x, y, w, h = a["bbox"]
        dets.append({
            "image_id": a["image_id"], "category_id": a["category_id"],
            "bbox": [x + 0.15 * w, y, w, h], "score": 0.8,
        })
    cocoDt = coco.loadRes(dets)
    E = COCOeval(coco, cocoDt, "bbox")
    E.evaluate()
    E.accumulate()
    stats = E.summarize()
    # IoU of a 15%-shifted box ~ 0.74: perfect at IoU<=0.7, zero above
    assert 0.3 < stats[0] < 0.8
    assert stats[1] == pytest.approx(1.0)  # AP50


def test_segm_eval_runs(tmp_path):
    gt_path, anns = _make_gt(tmp_path)
    coco = COCO(gt_path)
    from detectron_tpu.data import rle as mask_util

    dets = []
    for a in anns:
        x, y, w, h = [int(v) for v in a["bbox"]]
        m = np.zeros((150, 200), np.uint8)
        m[y:y + h, x:x + w] = 1
        dets.append({
            "image_id": a["image_id"], "category_id": a["category_id"],
            "segmentation": mask_util.encode(m), "score": 0.9,
        })
    cocoDt = coco.loadRes(dets)
    E = COCOeval(coco, cocoDt, "segm")
    E.evaluate()
    E.accumulate()
    stats = E.summarize()
    # box-shaped masks against polygon gt of the same box: near-perfect
    assert stats[0] > 0.9


def test_crowd_gt_not_counted(tmp_path):
    gt_path, anns = _make_gt(tmp_path, n_imgs=2, boxes_per_img=1)
    import json as _json

    with open(gt_path) as f:
        gt = _json.load(f)
    # add a crowd region nothing detects
    gt["annotations"].append({
        "id": 999, "image_id": 1, "category_id": 1,
        "bbox": [0.0, 0.0, 200.0, 150.0], "area": 30000.0, "iscrowd": 1,
        "segmentation": {"size": [150, 200], "counts": []},
    })
    p2 = tmp_path / "gt2.json"
    p2.write_text(_json.dumps(gt))
    coco = COCO(str(p2))
    dets = _perfect_dets(anns)
    cocoDt = coco.loadRes(dets)
    E = COCOeval(coco, cocoDt, "bbox")
    E.evaluate()
    E.accumulate()
    stats = E.summarize()
    assert stats[0] == pytest.approx(1.0)  # crowd gt is ignored


def test_evaluate_box_proposals():
    from detectron_tpu.data.json_dataset_evaluator import \
        evaluate_box_proposals

    roidb = [{
        "gt_classes": np.array([1, 2], np.int32),
        "is_crowd": np.array([False, False]),
        "boxes": np.array([[10, 10, 50, 50], [60, 60, 90, 90]], np.float32),
        "seg_areas": np.array([1600.0, 900.0], np.float32),
    }]
    # proposals covering both gts exactly -> AR 1
    stats = evaluate_box_proposals(
        roidb, [np.array([[10, 10, 50, 50], [60, 60, 90, 90]], np.float32)])
    assert stats["ar"] == pytest.approx(1.0)
    # proposals covering none -> AR 0
    stats0 = evaluate_box_proposals(
        roidb, [np.array([[100, 100, 120, 120]], np.float32)])
    assert stats0["ar"] == pytest.approx(0.0)
