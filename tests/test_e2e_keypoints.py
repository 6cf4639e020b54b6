"""End-to-end keypoint pipeline: synthetic person-keypoints dataset ->
detection with keypoint head -> keypoint decode -> COCO keypoint eval."""

import json

import numpy as np
import pytest

from detectron_tpu.core import config
from detectron_tpu.core.config import cfg

KP_NAMES = [
    "nose", "left_eye", "right_eye", "left_ear", "right_ear",
    "left_shoulder", "right_shoulder", "left_elbow", "right_elbow",
    "left_wrist", "right_wrist", "left_hip", "right_hip", "left_knee",
    "right_knee", "left_ankle", "right_ankle",
]


@pytest.fixture
def kps_dataset(tmp_path):
    import cv2

    img_dir = tmp_path / "coco" / "val2017"
    ann_dir = tmp_path / "coco" / "annotations"
    img_dir.mkdir(parents=True)
    ann_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    images, annotations = [], []
    for i in range(2):
        h, w = 96, 128
        cv2.imwrite(str(img_dir / "{:012d}.jpg".format(i + 1)),
                    rng.randint(0, 255, (h, w, 3), np.uint8))
        images.append({"id": i + 1, "width": w, "height": h,
                       "file_name": "{:012d}.jpg".format(i + 1)})
        kps = []
        for k in range(17):
            kps += [20.0 + k, 20.0 + (k % 5), 2]
        annotations.append({
            "id": i + 1, "image_id": i + 1, "category_id": 1,
            "bbox": [15.0, 15.0, 40.0, 30.0], "area": 1200.0, "iscrowd": 0,
            "keypoints": kps, "num_keypoints": 17,
        })
    gt = {
        "images": images,
        "annotations": annotations,
        "categories": [{
            "id": 1, "name": "person", "supercategory": "person",
            "keypoints": KP_NAMES,
            "skeleton": [],
        }],
    }
    (ann_dir / "person_keypoints_val2017.json").write_text(json.dumps(gt))
    config.merge_cfg_from_list(["DATA_DIR", str(tmp_path)])
    return tmp_path


def test_keypoint_dataset_and_eval(kps_dataset, tmp_path):
    config.merge_cfg_from_list([
        "MODEL.CONV_BODY", "FPN.fpn_ResNet50_conv5_body",
        "MODEL.FASTER_RCNN", "True",
        "MODEL.KEYPOINTS_ON", "True",
        "MODEL.NUM_CLASSES", "2",
        "FPN.FPN_ON", "True",
        "FPN.MULTILEVEL_ROIS", "True",
        "FPN.MULTILEVEL_RPN", "True",
        "FAST_RCNN.ROI_BOX_HEAD", "fast_rcnn_heads.roi_2mlp_head",
        "FAST_RCNN.ROI_XFORM_METHOD", "RoIAlign",
        "FAST_RCNN.ROI_XFORM_RESOLUTION", "7",
        "FAST_RCNN.ROI_XFORM_SAMPLING_RATIO", "2",
        "FAST_RCNN.MLP_HEAD_DIM", "32",
        "KRCNN.ROI_KEYPOINTS_HEAD",
        "keypoint_rcnn_heads.roi_pose_head_v1convX",
        "KRCNN.NUM_STACKED_CONVS", "2",
        "KRCNN.CONV_HEAD_DIM", "32",
        "KRCNN.NUM_KEYPOINTS", "17",
        "KRCNN.USE_DECONV_OUTPUT", "True",
        "KRCNN.UP_SCALE", "2",
        "KRCNN.HEATMAP_SIZE", "28",
        "KRCNN.ROI_XFORM_RESOLUTION", "7",
        "KRCNN.ROI_XFORM_SAMPLING_RATIO", "2",
        "TEST.SCALE", "96",
        "TEST.MAX_SIZE", "128",
        "TEST.RPN_PRE_NMS_TOP_N", "64",
        "TEST.RPN_POST_NMS_TOP_N", "16",
        "TEST.DETECTIONS_PER_IM", "4",
        "TEST.SCORE_THRESH", "0.0",
        "TPU.NMS_TILE_SIZE", "32",
        "TPU.ROI_IMPL", "windowed",
        "TPU.ROI_WINDOW", "16",
        "TPU.ROI_CHUNK", "16",
        "TEST.DATASETS", "('keypoints_coco_2017_val',)",
    ])
    config.assert_and_infer_cfg(make_immutable=False)

    from detectron_tpu.core import test_engine
    from detectron_tpu.data import task_evaluation
    from detectron_tpu.data.json_dataset import JsonDataset

    ds = JsonDataset("keypoints_coco_2017_val")
    assert ds.num_keypoints == 17
    roidb = ds.get_roidb(gt=True)
    assert roidb[0]["gt_keypoints"].shape == (1, 3, 17)
    assert roidb[0]["has_visible_keypoints"]

    params = test_engine.initialize_model_from_cfg()
    all_boxes, all_segms, all_keyps = test_engine.test_net(
        params, roidb, ds, batch_size=2, output_dir=None)
    # keypoint results recorded for the person class
    assert len(all_keyps[1]) == 2
    for img_kps in all_keyps[1]:
        for xy in img_kps:
            assert xy.shape == (4, 17)

    results = task_evaluation.evaluate_keypoints(
        ds, all_boxes, all_keyps, str(tmp_path / "out"))
    assert "keypoint" in results["keypoints_coco_2017_val"]
