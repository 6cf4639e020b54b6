"""End-to-end pipeline mechanics: synthetic COCO dataset on disk -> dataset
load -> jitted detection -> result structures -> COCO evaluation. Random
weights, so AP is meaningless — this locks the plumbing, shapes, and format
contracts across the whole inference stack."""

import json
import os

import numpy as np
import pytest

from detectron_tpu.core import config
from detectron_tpu.core.config import cfg


@pytest.fixture
def synthetic_dataset(tmp_path, monkeypatch):
    import cv2

    img_dir = tmp_path / "coco" / "val2017"
    ann_dir = tmp_path / "coco" / "annotations"
    img_dir.mkdir(parents=True)
    ann_dir.mkdir(parents=True)

    rng = np.random.RandomState(0)
    images = []
    annotations = []
    aid = 1
    for i in range(3):
        h, w = (96, 128) if i % 2 == 0 else (128, 96)
        im = rng.randint(0, 255, (h, w, 3), np.uint8)
        name = "{:012d}.jpg".format(i + 1)
        cv2.imwrite(str(img_dir / name), im)
        images.append({"id": i + 1, "width": w, "height": h,
                       "file_name": name})
        x, y, bw, bh = 10.0, 10.0, 40.0, 30.0
        annotations.append({
            "id": aid, "image_id": i + 1, "category_id": 1,
            "bbox": [x, y, bw, bh], "area": bw * bh, "iscrowd": 0,
            "segmentation": [[x, y, x + bw, y, x + bw, y + bh, x, y + bh]],
        })
        aid += 1
    gt = {
        "images": images,
        "annotations": annotations,
        "categories": [
            {"id": 1, "name": "widget", "supercategory": "thing"},
            {"id": 2, "name": "gadget", "supercategory": "thing"},
            {"id": 3, "name": "sprocket", "supercategory": "thing"},
        ],
    }
    (ann_dir / "instances_val2017.json").write_text(json.dumps(gt))
    config.merge_cfg_from_list(["DATA_DIR", str(tmp_path)])
    return tmp_path


def _tiny_infer_cfg(mask_on):
    config.merge_cfg_from_list([
        "MODEL.CONV_BODY", "FPN.fpn_ResNet50_conv5_body",
        "MODEL.FASTER_RCNN", "True",
        "MODEL.MASK_ON", str(mask_on),
        "MODEL.NUM_CLASSES", "4",
        "FPN.FPN_ON", "True",
        "FPN.MULTILEVEL_ROIS", "True",
        "FPN.MULTILEVEL_RPN", "True",
        "FAST_RCNN.ROI_BOX_HEAD", "fast_rcnn_heads.roi_2mlp_head",
        "FAST_RCNN.ROI_XFORM_METHOD", "RoIAlign",
        "FAST_RCNN.ROI_XFORM_RESOLUTION", "7",
        "FAST_RCNN.ROI_XFORM_SAMPLING_RATIO", "2",
        "FAST_RCNN.MLP_HEAD_DIM", "32",
        "MRCNN.ROI_MASK_HEAD", "mask_rcnn_heads.mask_rcnn_fcn_head_v1up4convs",
        "MRCNN.RESOLUTION", "14",
        "MRCNN.ROI_XFORM_RESOLUTION", "7",
        "MRCNN.ROI_XFORM_SAMPLING_RATIO", "2",
        "MRCNN.DILATION", "1",
        "TEST.SCALE", "96",
        "TEST.MAX_SIZE", "128",
        "TEST.RPN_PRE_NMS_TOP_N", "64",
        "TEST.RPN_POST_NMS_TOP_N", "16",
        "TEST.DETECTIONS_PER_IM", "8",
        "TEST.SCORE_THRESH", "0.0",
        "TPU.NMS_TILE_SIZE", "32",
        "TPU.ROI_IMPL", "windowed",
        "TPU.ROI_WINDOW", "16",
        "TPU.ROI_CHUNK", "16",
        "TEST.DATASETS", "('coco_2017_val',)",
    ])
    config.assert_and_infer_cfg(make_immutable=False)


def test_full_inference_and_eval(synthetic_dataset, tmp_path):
    _tiny_infer_cfg(mask_on=True)

    from detectron_tpu.core import test_engine
    from detectron_tpu.data import task_evaluation
    from detectron_tpu.data.json_dataset import JsonDataset

    ds = JsonDataset("coco_2017_val")
    roidb = ds.get_roidb(gt=True)
    assert len(roidb) == 3
    assert roidb[0]["boxes"].shape == (1, 4)

    params = test_engine.initialize_model_from_cfg()
    out_dir = str(tmp_path / "out")
    all_boxes, all_segms, all_keyps = test_engine.test_net(
        params, roidb, ds, batch_size=2, output_dir=out_dir)

    assert len(all_boxes) == 4  # classes incl background
    assert len(all_boxes[1]) == 3  # images
    assert os.path.exists(os.path.join(out_dir, "detections.pkl"))

    results = task_evaluation.evaluate_all(
        ds, all_boxes, all_segms, all_keyps, out_dir)
    assert "box" in results["coco_2017_val"]
    assert "mask" in results["coco_2017_val"]
    assert "AP" in results["coco_2017_val"]["box"]


def test_im_detect_all_host_path(synthetic_dataset):
    """Soft-NMS + host NMS path through im_detect_all."""
    import cv2
    import jax

    from detectron_tpu.core import test as test_ops
    from detectron_tpu.core import test_engine

    _tiny_infer_cfg(mask_on=False)
    config.merge_cfg_from_list(["TEST.SOFT_NMS.ENABLED", "True"])

    params = test_engine.initialize_model_from_cfg()
    fns = {
        "detect_raw": jax.jit(test_ops.detect_raw),
        "mask_on_boxes": jax.jit(test_ops.mask_on_boxes_graph),
        "kps_on_boxes": jax.jit(test_ops.kps_on_boxes_graph),
    }
    img_path = os.path.join(
        str(synthetic_dataset), "coco", "val2017", "000000000001.jpg")
    im = cv2.imread(img_path)
    cls_boxes, cls_segms, cls_keyps = test_ops.im_detect_all(
        params, im, fns)
    assert len(cls_boxes) == 4
    total = sum(len(b) for b in cls_boxes[1:])
    assert total <= cfg.TEST.DETECTIONS_PER_IM * 3


def test_precomputed_proposals_mode(synthetic_dataset, tmp_path):
    """Fast R-CNN mode: external proposals, no RPN (the reference's
    TEST.PRECOMPUTED_PROPOSALS path)."""
    _tiny_infer_cfg(mask_on=False)
    config.merge_cfg_from_list([
        "TEST.PRECOMPUTED_PROPOSALS", "True",
        "TEST.PROPOSAL_LIMIT", "8",
        "MODEL.FASTER_RCNN", "False",
    ])
    cfg.RPN.RPN_ON = False

    from detectron_tpu.core import test_engine
    from detectron_tpu.data.json_dataset import JsonDataset

    ds = JsonDataset("coco_2017_val")
    roidb = ds.get_roidb(gt=True)
    # Entries carry gt boxes only; add a few fake proposals per image the
    # way a proposal file would (gt_classes == 0 marks non-gt boxes).
    import numpy as np
    from detectron_tpu.data import json_dataset as jd

    box_list = [np.array([[5, 5, 60, 60], [20, 20, 80, 70]], np.float32)
                for _ in roidb]
    jd._merge_proposal_boxes_into_roidb(roidb, box_list)

    params = test_engine.initialize_model_from_cfg()
    all_boxes, _, _ = test_engine.test_net(
        params, roidb, ds, batch_size=2, output_dir=None)
    assert len(all_boxes) == 4
    assert len(all_boxes[1]) == 3


def test_multi_device_eval_sharding(synthetic_dataset, tmp_path):
    """Eval with the batch sharded over the 8 virtual devices (the
    reference's multi-GPU subprocess sharding, as one SPMD program)."""
    import jax

    _tiny_infer_cfg(mask_on=False)
    from detectron_tpu.core import test_engine
    from detectron_tpu.data.json_dataset import JsonDataset

    assert len(jax.devices()) == 8
    ds = JsonDataset("coco_2017_val")
    roidb = ds.get_roidb(gt=True)
    params = test_engine.initialize_model_from_cfg()
    all_boxes, _, _ = test_engine.test_net(
        params, roidb, ds, batch_size=8, output_dir=None)
    assert len(all_boxes[1]) == 3


def test_device_graph_matches_host_path(synthetic_dataset):
    """The all-device detect graph must produce the same final detections as
    the host composition (detect_raw + host per-class NMS + limit) — the
    whole in-graph pipeline cross-checked against the reference-structured
    path on identical weights."""
    import cv2
    import jax

    from detectron_tpu.core import test as test_ops
    from detectron_tpu.core import test_engine
    from detectron_tpu.utils import blob as blob_utils

    _tiny_infer_cfg(mask_on=False)
    params = test_engine.initialize_model_from_cfg()

    img_path = os.path.join(
        str(synthetic_dataset), "coco", "val2017", "000000000001.jpg")
    im = cv2.imread(img_path)
    import jax.numpy as jnp

    blob, scale, im_info = blob_utils.get_image_blob(im)

    # Device pipeline
    out = jax.jit(test_ops.detect_graph)(
        params, jnp.asarray(blob), jnp.asarray(im_info))
    valid = np.asarray(out["valid"][0])
    dev_boxes = np.asarray(out["boxes"][0])[valid] / scale
    dev_scores = np.asarray(out["scores"][0])[valid]

    # Host-reference composition
    raw = jax.jit(test_ops.detect_raw)(
        params, jnp.asarray(blob), jnp.asarray(im_info))
    scores = np.asarray(raw["scores"][0])
    boxes = np.asarray(raw["boxes"][0]) / scale
    h_scores, h_boxes, _ = test_ops.box_results_with_nms_and_limit(
        scores, boxes)

    assert len(dev_scores) == len(h_scores)
    ds = np.argsort(-dev_scores)
    hs = np.argsort(-h_scores)
    np.testing.assert_allclose(dev_scores[ds], h_scores[hs], rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(dev_boxes[ds], h_boxes[hs], rtol=1e-3,
                               atol=0.05)


def test_engine_routes_flags_through_im_detect_all(synthetic_dataset,
                                                   tmp_path):
    """TEST.SOFT_NMS (and TTA/vote) flags must change tools/test_net.py
    output: test_net dispatches to the per-image im_detect_all path when any
    flag is set (reference: lib/core/test_engine.py :: test_net ->
    im_detect_all always)."""
    _tiny_infer_cfg(mask_on=False)

    from detectron_tpu.core import test_engine
    from detectron_tpu.data import task_evaluation
    from detectron_tpu.data.json_dataset import JsonDataset

    ds = JsonDataset("coco_2017_val")
    roidb = ds.get_roidb(gt=True)
    params = test_engine.initialize_model_from_cfg()

    plain = test_engine.test_net(params, roidb, ds, batch_size=2)

    config.merge_cfg_from_list([
        "TEST.SOFT_NMS.ENABLED", "True",
        "TEST.SOFT_NMS.METHOD", "gaussian",
        "TEST.SOFT_NMS.SIGMA", "0.5",
    ])
    out_dir = str(tmp_path / "soft_out")
    soft = test_engine.test_net(params, roidb, ds, batch_size=2,
                                output_dir=out_dir)
    config.merge_cfg_from_list(["TEST.SOFT_NMS.ENABLED", "False"])

    assert os.path.exists(os.path.join(out_dir, "detections.pkl"))
    # Soft-NMS decays rather than kills overlaps: same images, different
    # per-class score sets.
    def _all_scores(all_boxes):
        out = [im_b[:, -1] for j in range(1, 4) for im_b in all_boxes[j]
               if len(im_b)]
        return np.sort(np.concatenate(out or [np.zeros(1)]))

    plain_scores = _all_scores(plain[0])
    soft_scores = _all_scores(soft[0])
    assert (plain_scores.shape != soft_scores.shape
            or not np.allclose(plain_scores, soft_scores))
    # And the results still evaluate end-to-end.
    results = task_evaluation.evaluate_all(
        ds, soft[0], soft[1], soft[2], out_dir)
    assert "box" in results["coco_2017_val"]


def test_run_inference_ind_range(synthetic_dataset, tmp_path):
    """--range [start end): evaluates the subrange only, writes
    detection_range_{s}_{e}.pkl, skips dataset evaluation."""
    import pickle

    _tiny_infer_cfg(mask_on=False)
    from detectron_tpu.core import test_engine

    out_dir = str(tmp_path / "range_out")
    res = test_engine.run_inference(
        None, dataset_name="coco_2017_val", output_dir=out_dir,
        batch_size=2, ind_range=(1, 3))
    assert res is None
    pkl = os.path.join(out_dir, "detection_range_1_3.pkl")
    assert os.path.exists(pkl)
    with open(pkl, "rb") as f:
        payload = pickle.load(f)
    assert payload["start"] == 1 and payload["end"] == 3
    assert len(payload["all_boxes"][1]) == 2  # only 2 of the 3 images


def test_im_detect_all_with_bbox_aug(synthetic_dataset):
    """TTA end-to-end: hflip + one extra scale, UNION combination."""
    import cv2
    import jax

    from detectron_tpu.core import test as test_ops
    from detectron_tpu.core import test_engine

    _tiny_infer_cfg(mask_on=False)
    config.merge_cfg_from_list([
        "TEST.BBOX_AUG.ENABLED", "True",
        "TEST.BBOX_AUG.H_FLIP", "True",
        "TEST.BBOX_AUG.SCALES", "(64,)",
        "TEST.BBOX_AUG.MAX_SIZE", "96",
        "TEST.BBOX_AUG.SCALE_H_FLIP", "True",
    ])
    params = test_engine.initialize_model_from_cfg()
    fns = {"detect_raw": jax.jit(test_ops.detect_raw)}
    img_path = os.path.join(
        str(synthetic_dataset), "coco", "val2017", "000000000001.jpg")
    im = cv2.imread(img_path)
    cls_boxes, _, _ = test_ops.im_detect_all(params, im, fns)
    total = sum(len(b) for b in cls_boxes[1:])
    assert 0 < total <= cfg.TEST.DETECTIONS_PER_IM * 3
    for j in range(1, 4):
        if len(cls_boxes[j]):
            b = cls_boxes[j]
            # decode can emit sub-pixel boxes with x2 = x1 + w - 1 slightly
            # below x1 (reference bbox_transform semantics)
            assert (b[:, 2] >= b[:, 0] - 1.0).all()
            assert (b[:, 0] >= -1.5).all() and (b[:, 2] <= im.shape[1]).all()


def test_c4_full_inference_and_eval(synthetic_dataset, tmp_path):
    """R-50-C4 end-to-end inference + COCO eval (the BASELINE config #1
    shape: single-level body, res5 RoI head, no FPN). Locks the C4 slice of
    the pipeline the same way test_full_inference_and_eval locks FPN."""
    config.merge_cfg_from_list([
        "MODEL.CONV_BODY", "ResNet.ResNet50_conv4_body",
        "MODEL.FASTER_RCNN", "True",
        "MODEL.MASK_ON", "False",
        "MODEL.NUM_CLASSES", "4",
        "FAST_RCNN.ROI_BOX_HEAD", "ResNet.ResNet_roi_conv5_head",
        "FAST_RCNN.ROI_XFORM_METHOD", "RoIAlign",
        "FAST_RCNN.ROI_XFORM_RESOLUTION", "14",
        "FAST_RCNN.ROI_XFORM_SAMPLING_RATIO", "0",
        "TEST.SCALE", "96",
        "TEST.MAX_SIZE", "128",
        "TEST.RPN_PRE_NMS_TOP_N", "64",
        "TEST.RPN_POST_NMS_TOP_N", "16",
        "TEST.DETECTIONS_PER_IM", "8",
        "TEST.SCORE_THRESH", "0.0",
        "TPU.NMS_TILE_SIZE", "32",
        "TEST.DATASETS", "('coco_2017_val',)",
    ])
    config.assert_and_infer_cfg(make_immutable=False)

    from detectron_tpu.core import test_engine
    from detectron_tpu.data import task_evaluation
    from detectron_tpu.data.json_dataset import JsonDataset

    ds = JsonDataset("coco_2017_val")
    roidb = ds.get_roidb(gt=True)
    params = test_engine.initialize_model_from_cfg()
    out_dir = str(tmp_path / "out_c4")
    all_boxes, all_segms, all_keyps = test_engine.test_net(
        params, roidb, ds, batch_size=2, output_dir=out_dir)

    assert len(all_boxes) == 4 and len(all_boxes[1]) == 3
    assert os.path.exists(os.path.join(out_dir, "detections.pkl"))
    results = task_evaluation.evaluate_all(
        ds, all_boxes, all_segms, all_keyps, out_dir)
    assert "box" in results["coco_2017_val"]
    assert "AP" in results["coco_2017_val"]["box"]
