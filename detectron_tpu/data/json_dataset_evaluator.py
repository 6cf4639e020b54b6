"""COCO-style result writing + evaluation.

Rebuilds lib/datasets/json_dataset_evaluator.py (evaluate_boxes,
evaluate_masks, evaluate_keypoints, the _write_coco_*_results_file helpers)
on the from-scratch COCO API + COCOeval (data/coco_json.py, data/coco_eval.py).
"""

import json
import logging
import os

import numpy as np

from detectron_tpu.core.config import cfg
from detectron_tpu.data.coco_eval import COCOeval
from detectron_tpu.utils import boxes as box_utils

logger = logging.getLogger(__name__)


def _results_one_category_boxes(dataset, boxes, cat_id):
    results = []
    image_ids = dataset.COCO.getImgIds()
    image_ids.sort()
    assert len(boxes) == len(image_ids)
    for i, image_id in enumerate(image_ids):
        dets = boxes[i]
        if isinstance(dets, list) and len(dets) == 0:
            continue
        dets = dets.astype(np.float64)
        scores = dets[:, -1]
        xywh_dets = box_utils.xyxy_to_xywh(dets[:, 0:4])
        xs = xywh_dets[:, 0]
        ys = xywh_dets[:, 1]
        ws = xywh_dets[:, 2]
        hs = xywh_dets[:, 3]
        results.extend([
            {"image_id": image_id, "category_id": cat_id,
             "bbox": [float(xs[k]), float(ys[k]), float(ws[k]),
                      float(hs[k])],
             "score": float(scores[k])}
            for k in range(dets.shape[0])
        ])
    return results


def write_coco_bbox_results_file(dataset, all_boxes, res_file):
    results = []
    for cls_ind, cls in enumerate(dataset.classes):
        if cls == "__background__" or cls_ind >= len(all_boxes):
            continue
        cat_id = dataset.category_to_id_map[cls]
        results.extend(
            _results_one_category_boxes(dataset, all_boxes[cls_ind], cat_id))
    logger.info("Writing bbox results json to: %s",
                os.path.abspath(res_file))
    with open(res_file, "w") as f:
        json.dump(results, f)
    return res_file


def evaluate_boxes(dataset, all_boxes, output_dir, use_salt=False):
    res_file = os.path.join(output_dir, "bbox_" + dataset.name +
                            "_results.json")
    os.makedirs(output_dir, exist_ok=True)
    write_coco_bbox_results_file(dataset, all_boxes, res_file)
    coco_dt = dataset.COCO.loadRes(res_file)
    coco_eval = COCOeval(dataset.COCO, coco_dt, "bbox")
    coco_eval.evaluate()
    coco_eval.accumulate()
    coco_eval.summarize()
    _log_detection_eval_metrics(dataset, coco_eval)
    return coco_eval


def _results_one_category_segms(dataset, boxes, segms, cat_id):
    results = []
    image_ids = dataset.COCO.getImgIds()
    image_ids.sort()
    assert len(boxes) == len(image_ids)
    for i, image_id in enumerate(image_ids):
        dets = boxes[i]
        rles = segms[i]
        if isinstance(dets, list) and len(dets) == 0:
            continue
        dets = dets.astype(np.float64)
        scores = dets[:, -1]
        results.extend([
            {"image_id": image_id, "category_id": cat_id,
             "segmentation": rles[k], "score": float(scores[k])}
            for k in range(dets.shape[0])
        ])
    return results


def evaluate_masks(dataset, all_boxes, all_segms, output_dir):
    res_file = os.path.join(output_dir, "segm_" + dataset.name +
                            "_results.json")
    os.makedirs(output_dir, exist_ok=True)
    results = []
    for cls_ind, cls in enumerate(dataset.classes):
        if cls == "__background__" or cls_ind >= len(all_boxes):
            continue
        cat_id = dataset.category_to_id_map[cls]
        results.extend(_results_one_category_segms(
            dataset, all_boxes[cls_ind], all_segms[cls_ind], cat_id))
    with open(res_file, "w") as f:
        json.dump(results, f)
    coco_dt = dataset.COCO.loadRes(res_file)
    coco_eval = COCOeval(dataset.COCO, coco_dt, "segm")
    coco_eval.evaluate()
    coco_eval.accumulate()
    coco_eval.summarize()
    _log_detection_eval_metrics(dataset, coco_eval)
    return coco_eval


def _results_one_category_kps(dataset, boxes, kps, cat_id):
    results = []
    image_ids = dataset.COCO.getImgIds()
    image_ids.sort()
    assert len(boxes) == len(image_ids)
    for i, image_id in enumerate(image_ids):
        if len(boxes[i]) == 0:
            continue
        kps_dets = kps[i]
        scores = boxes[i][:, -1].astype(np.float64)
        for k in range(len(kps_dets)):
            xy = []
            for kp_i in range(kps_dets[k].shape[1]):
                xy += [float(kps_dets[k][0, kp_i]),
                       float(kps_dets[k][1, kp_i]),
                       1.0]
            results.append({
                "image_id": image_id, "category_id": cat_id,
                "keypoints": xy, "score": float(scores[k])})
    return results


def evaluate_keypoints(dataset, all_boxes, all_keyps, output_dir):
    res_file = os.path.join(output_dir, "keypoints_" + dataset.name +
                            "_results.json")
    os.makedirs(output_dir, exist_ok=True)
    person_idx = dataset.classes.index("person")
    cat_id = dataset.category_to_id_map["person"]
    results = _results_one_category_kps(
        dataset, all_boxes[person_idx], all_keyps[person_idx], cat_id)
    with open(res_file, "w") as f:
        json.dump(results, f)
    coco_dt = dataset.COCO.loadRes(res_file)
    coco_eval = COCOeval(dataset.COCO, coco_dt, "keypoints")
    coco_eval.evaluate()
    coco_eval.accumulate()
    coco_eval.summarize()
    return coco_eval


def evaluate_box_proposals(roidb, box_list, thresholds=None, area="all",
                           limit=None):
    """Average-recall statistics for proposals (the reference's RPN_ONLY
    evaluation, lib/datasets/json_dataset_evaluator.py ::
    evaluate_box_proposals). roidb entries carry gt; box_list[i] is (N, 4)
    proposals for image i. Returns dict(ar, recalls, thresholds,
    gt_overlaps, num_pos)."""
    areas = {
        "all": 0, "small": 1, "medium": 2, "large": 3,
        "96-128": 4, "128-256": 5, "256-512": 6, "512-inf": 7,
    }
    area_ranges = [
        [0**2, 1e5**2], [0**2, 32**2], [32**2, 96**2], [96**2, 1e5**2],
        [96**2, 128**2], [128**2, 256**2], [256**2, 512**2],
        [512**2, 1e5**2],
    ]
    assert area in areas
    area_range = area_ranges[areas[area]]
    gt_overlaps = np.zeros(0)
    num_pos = 0
    for i, entry in enumerate(roidb):
        gt_inds = np.where(
            (entry["gt_classes"] > 0) & (entry["is_crowd"] == 0))[0]
        gt_boxes = entry["boxes"][gt_inds, :]
        gt_areas = entry["seg_areas"][gt_inds]
        valid_gt = np.where(
            (gt_areas >= area_range[0]) & (gt_areas <= area_range[1]))[0]
        gt_boxes = gt_boxes[valid_gt, :]
        num_pos += len(valid_gt)
        boxes = np.asarray(box_list[i])
        if limit is not None and boxes.shape[0] > limit:
            boxes = boxes[:limit, :]
        if boxes.shape[0] == 0 or gt_boxes.shape[0] == 0:
            continue
        overlaps = box_utils.bbox_overlaps(boxes, gt_boxes)
        _gt_overlaps = np.zeros(gt_boxes.shape[0])
        for j in range(min(boxes.shape[0], gt_boxes.shape[0])):
            argmax_overlaps = overlaps.argmax(axis=0)
            max_overlaps = overlaps.max(axis=0)
            gt_ind = max_overlaps.argmax()
            gt_ovr = max_overlaps.max()
            assert gt_ovr >= 0
            box_ind = argmax_overlaps[gt_ind]
            _gt_overlaps[j] = overlaps[box_ind, gt_ind]
            assert _gt_overlaps[j] == gt_ovr
            overlaps[box_ind, :] = -1
            overlaps[:, gt_ind] = -1
        gt_overlaps = np.hstack((gt_overlaps, _gt_overlaps))
    gt_overlaps = np.sort(gt_overlaps)
    if thresholds is None:
        step = 0.05
        thresholds = np.arange(0.5, 0.95 + 1e-5, step)
    recalls = np.zeros_like(thresholds)
    for i, t in enumerate(thresholds):
        recalls[i] = (gt_overlaps >= t).sum() / float(max(num_pos, 1))
    ar = recalls.mean()
    return {"ar": ar, "recalls": recalls, "thresholds": thresholds,
            "gt_overlaps": gt_overlaps, "num_pos": num_pos}


def _log_detection_eval_metrics(dataset, coco_eval):
    IoU_lo_thresh = 0.5
    IoU_hi_thresh = 0.95
    ap = coco_eval.stats[0]
    logger.info("~~~~ Mean and per-category AP @ IoU=[{:.2f},{:.2f}] "
                "~~~~".format(IoU_lo_thresh, IoU_hi_thresh))
    logger.info("{:.1f}".format(100 * ap))
    precision = coco_eval.eval["precision"]
    for cls_ind, cls in enumerate(dataset.classes):
        if cls == "__background__":
            continue
        p = precision[:, :, cls_ind - 1, 0, 2 if precision.shape[-1] > 2
                      else -1]
        ap_c = np.mean(p[p > -1]) if len(p[p > -1]) else -1
        logger.info("{}: {:.1f}".format(cls, 100 * ap_c))
