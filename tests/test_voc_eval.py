"""PASCAL VOC evaluation: devkit-XML protocol (reference voc_eval.py) vs
the COCO-converted-json fallback on identical synthetic ground truth."""

import json
import os

import numpy as np
import pytest

from detectron_tpu.core import config


CLASSES = ("aeroplane", "bicycle")


@pytest.fixture
def voc_env(tmp_path):
    """Build data/VOC2007 with BOTH a converted json and a devkit tree."""
    # --- ground truth: 3 images, 2 classes
    gt = {
        1: [("aeroplane", [10, 10, 60, 50], 0),
            ("bicycle", [70, 20, 110, 70], 0)],
        2: [("aeroplane", [5, 5, 45, 45], 1)],  # difficult
        3: [("bicycle", [30, 30, 90, 90], 0)],
    }
    # converted json
    ann_dir = tmp_path / "VOC2007" / "annotations"
    ann_dir.mkdir(parents=True)
    images, annotations = [], []
    aid = 1
    for img_id, objs in gt.items():
        images.append({"id": img_id, "width": 128, "height": 96,
                       "file_name": "{:06d}.jpg".format(img_id)})
        for name, (x1, y1, x2, y2), diff in objs:
            annotations.append({
                "id": aid, "image_id": img_id,
                "category_id": CLASSES.index(name) + 1,
                "bbox": [x1, y1, x2 - x1 + 1, y2 - y1 + 1],
                "area": (x2 - x1 + 1) * (y2 - y1 + 1),
                "iscrowd": 0, "difficult": diff,
            })
            aid += 1
    (ann_dir / "voc_2007_test.json").write_text(json.dumps({
        "images": images, "annotations": annotations,
        "categories": [{"id": i + 1, "name": n, "supercategory": "voc"}
                       for i, n in enumerate(CLASSES)],
    }))
    img_dir = tmp_path / "VOC2007" / "JPEGImages"
    img_dir.mkdir()

    # devkit tree with XMLs (1-based coords in XML)
    devkit = tmp_path / "VOC2007" / "VOCdevkit2007" / "VOC2007"
    (devkit / "Annotations").mkdir(parents=True)
    (devkit / "ImageSets" / "Main").mkdir(parents=True)
    stems = []
    for img_id, objs in gt.items():
        stem = "{:06d}".format(img_id)
        stems.append(stem)
        objs_xml = "".join(
            "<object><name>{}</name><difficult>{}</difficult>"
            "<bndbox><xmin>{}</xmin><ymin>{}</ymin>"
            "<xmax>{}</xmax><ymax>{}</ymax></bndbox></object>".format(
                name, diff, x1 + 1, y1 + 1, x2 + 1, y2 + 1)
            for name, (x1, y1, x2, y2), diff in objs)
        (devkit / "Annotations" / (stem + ".xml")).write_text(
            "<annotation>{}</annotation>".format(objs_xml))
    (devkit / "ImageSets" / "Main" / "test.txt").write_text(
        "\n".join(stems) + "\n")

    config.merge_cfg_from_list(["DATA_DIR", str(tmp_path)])
    return tmp_path


def _fake_detections(num_images=3):
    """[cls][img] (N, 5): one good det per gt + one false positive."""
    all_boxes = [[np.zeros((0, 5), np.float32) for _ in range(num_images)]
                 for _ in range(len(CLASSES) + 1)]
    # aeroplane: hit img1 gt, hit img2 (difficult), fp on img3
    all_boxes[1][0] = np.array([[11, 11, 59, 49, 0.9]], np.float32)
    all_boxes[1][1] = np.array([[6, 6, 44, 44, 0.8]], np.float32)
    all_boxes[1][2] = np.array([[0, 0, 20, 20, 0.3]], np.float32)
    # bicycle: hit img1, hit img3
    all_boxes[2][0] = np.array([[71, 21, 109, 69, 0.95]], np.float32)
    all_boxes[2][2] = np.array([[31, 31, 89, 89, 0.7]], np.float32)
    return all_boxes


def test_devkit_xml_matches_json_protocol(voc_env, tmp_path):
    from detectron_tpu.data import voc_dataset_evaluator as voc
    from detectron_tpu.data.json_dataset import JsonDataset

    ds = JsonDataset("voc_2007_test")
    all_boxes = _fake_detections()

    res_xml = voc.evaluate_boxes(ds, all_boxes, str(tmp_path / "o1"))
    assert res_xml.get("protocol") == "devkit_xml"
    assert res_xml["use_07_metric"] is True

    # Force the json route by hiding the devkit
    import detectron_tpu.data.dataset_catalog as cat
    entry = cat.DATASETS["voc_2007_test"]
    saved = entry[cat.DEVKIT_DIR]
    entry[cat.DEVKIT_DIR] = "/nonexistent"
    try:
        res_json = voc.evaluate_boxes(ds, all_boxes, str(tmp_path / "o2"))
    finally:
        entry[cat.DEVKIT_DIR] = saved
    assert "protocol" not in res_json

    assert res_xml["map"] == pytest.approx(res_json["map"], abs=1e-6)
    for c in CLASSES:
        assert res_xml["aps"][c] == pytest.approx(res_json["aps"][c],
                                                  abs=1e-6)
    # Perfect dets on non-difficult gt => AP 1.0 under the 07 metric
    assert res_xml["aps"]["bicycle"] == pytest.approx(1.0)
    # Results files written in the standard comp4 format
    f = tmp_path / "o1" / "comp4_det_test_aeroplane.txt"
    assert f.exists()
    line = f.read_text().splitlines()[0].split()
    assert line[0] == "000001" and len(line) == 6
