"""Cityscapes official instance-level protocol on synthetic data: perfect
predictions -> AP 1.0; predictions on crowd regions absorbed (not FPs);
tiny gt instances ignored."""

import json

import numpy as np
import pytest

from detectron_tpu.core import config
from detectron_tpu.data import rle as mask_util


def _rect_mask(h, w, y1, y2, x1, x2):
    m = np.zeros((h, w), np.uint8)
    m[y1:y2, x1:x2] = 1
    return m


@pytest.fixture
def cs_dataset(tmp_path):
    h, w = 64, 96
    ann_dir = tmp_path / "cityscapes" / "annotations"
    ann_dir.mkdir(parents=True)
    (tmp_path / "cityscapes" / "images").mkdir()
    imgs, anns = [], []
    aid = 1
    for i in (1, 2):
        imgs.append({"id": i, "width": w, "height": h,
                     "file_name": "f{}_leftImg8bit.png".format(i)})
    # img1: one real car (24x24 = 576 px), one crowd car region, one tiny
    # (5x5=25 < 100 px) car instance that must be IGNORED
    anns.append({"id": aid, "image_id": 1, "category_id": 1, "iscrowd": 0,
                 "bbox": [8, 8, 24, 24], "area": 576,
                 "segmentation": [[8, 8, 32, 8, 32, 32, 8, 32]]})
    aid += 1
    anns.append({"id": aid, "image_id": 1, "category_id": 1, "iscrowd": 1,
                 "bbox": [60, 10, 20, 20], "area": 400,
                 "segmentation": [[60, 10, 80, 10, 80, 30, 60, 30]]})
    aid += 1
    anns.append({"id": aid, "image_id": 1, "category_id": 1, "iscrowd": 0,
                 "bbox": [40, 50, 5, 5], "area": 25,
                 "segmentation": [[40, 50, 45, 50, 45, 55, 40, 55]]})
    aid += 1
    # img2: one real car
    anns.append({"id": aid, "image_id": 2, "category_id": 1, "iscrowd": 0,
                 "bbox": [10, 10, 30, 30], "area": 900,
                 "segmentation": [[10, 10, 40, 10, 40, 40, 10, 40]]})
    gt = {"images": imgs, "annotations": anns,
          "categories": [{"id": 1, "name": "car", "supercategory": "v"}]}
    (ann_dir / "instancesonly_filtered_gtFine_val.json").write_text(
        json.dumps(gt))

    import detectron_tpu.data.dataset_catalog as cat
    cat.DATASETS["cityscapes_test_tiny"] = {
        cat.IM_DIR: cat._D("cityscapes/images"),
        cat.ANN_FN: cat._D(
            "cityscapes/annotations/instancesonly_filtered_gtFine_val.json"),
    }
    config.merge_cfg_from_list(["DATA_DIR", str(tmp_path)])
    from detectron_tpu.data.json_dataset import JsonDataset

    return JsonDataset("cityscapes_test_tiny"), (h, w)


def _results(ds, hw, perfect=True, add_crowd_pred=False):
    h, w = hw
    n_img = 2
    all_boxes = [[np.zeros((0, 5), np.float32) for _ in range(n_img)]
                 for _ in range(2)]
    all_segms = [[[] for _ in range(n_img)] for _ in range(2)]
    # img1 real gt at [8:32, 8:32]; img2 at [10:40, 10:40]
    m1 = _rect_mask(h, w, 8, 32, 8, 32)
    m2 = _rect_mask(h, w, 10, 40, 10, 40)
    if not perfect:
        m2 = _rect_mask(h, w, 25, 40, 25, 40)  # IoU ~0.25: low-quality
    boxes1 = [[8, 8, 31, 31, 0.9]]
    segs1 = [mask_util.encode(m1)]
    if add_crowd_pred:
        # a prediction fully inside the crowd region: must NOT count as FP
        mc = _rect_mask(h, w, 12, 28, 62, 78)
        boxes1.append([62, 12, 77, 27, 0.95])
        segs1.append(mask_util.encode(mc))
    all_boxes[1][0] = np.array(boxes1, np.float32)
    all_segms[1][0] = segs1
    all_boxes[1][1] = np.array([[10, 10, 39, 39, 0.8]], np.float32)
    all_segms[1][1] = [mask_util.encode(m2)]
    return all_boxes, all_segms


def test_perfect_predictions_ap1(cs_dataset):
    from detectron_tpu.data import cityscapes_json_dataset_evaluator as cs

    ds, hw = cs_dataset
    all_boxes, all_segms = _results(ds, hw, perfect=True)
    res = cs.evaluate_masks_official(ds, all_boxes, all_segms)
    assert res["ap_official"] == pytest.approx(1.0)
    assert res["ap50_official"] == pytest.approx(1.0)


def test_crowd_absorbs_predictions(cs_dataset):
    """A prediction on a crowd/group region is neither TP nor FP."""
    from detectron_tpu.data import cityscapes_json_dataset_evaluator as cs

    ds, hw = cs_dataset
    all_boxes, all_segms = _results(ds, hw, perfect=True,
                                    add_crowd_pred=True)
    res = cs.evaluate_masks_official(ds, all_boxes, all_segms)
    assert res["ap_official"] == pytest.approx(1.0)


def test_low_iou_prediction_drops_ap(cs_dataset):
    from detectron_tpu.data import cityscapes_json_dataset_evaluator as cs

    ds, hw = cs_dataset
    all_boxes, all_segms = _results(ds, hw, perfect=False)
    res = cs.evaluate_masks_official(ds, all_boxes, all_segms)
    assert res["ap50_official"] < 1.0
    assert res["ap_official"] < res["ap50_official"] + 1e-9
