"""PASCAL VOC evaluation.

Rebuilds lib/datasets/voc_dataset_evaluator.py + voc_eval.py: per-class AP
with the VOC2007 11-point / VOC2010+ all-point protocols. Ground truth is
read from the dataset's COCO-converted json (the reference shells out to the
VOC devkit XML; the json route gives identical boxes and difficult flags).
"""

import logging
import os
from collections import defaultdict

import numpy as np

logger = logging.getLogger(__name__)


def voc_ap(rec, prec, use_07_metric=False):
    """Average precision from recall/precision curves."""
    if use_07_metric:
        ap = 0.0
        for t in np.arange(0.0, 1.1, 0.1):
            p = 0.0 if np.sum(rec >= t) == 0 else np.max(prec[rec >= t])
            ap += p / 11.0
        return ap
    mrec = np.concatenate(([0.0], rec, [1.0]))
    mpre = np.concatenate(([0.0], prec, [0.0]))
    for i in range(mpre.size - 1, 0, -1):
        mpre[i - 1] = np.maximum(mpre[i - 1], mpre[i])
    i = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[i + 1] - mrec[i]) * mpre[i + 1]))


def voc_eval_class(gt_by_img, dets, ovthresh=0.5, use_07_metric=False):
    """gt_by_img: img_id -> (boxes (N,4) xyxy, difficult (N,));
    dets: list of (img_id, score, x1, y1, x2, y2)."""
    npos = 0
    marks = {}
    for img_id, (boxes, difficult) in gt_by_img.items():
        npos += int((~difficult).sum())
        marks[img_id] = np.zeros(len(boxes), bool)

    if len(dets) == 0:
        return 0.0, np.array([]), np.array([])

    dets = sorted(dets, key=lambda d: -d[1])
    nd = len(dets)
    tp = np.zeros(nd)
    fp = np.zeros(nd)
    for d, (img_id, score, x1, y1, x2, y2) in enumerate(dets):
        if img_id not in gt_by_img:
            fp[d] = 1
            continue
        boxes, difficult = gt_by_img[img_id]
        ovmax = -np.inf
        jmax = -1
        if len(boxes):
            ixmin = np.maximum(boxes[:, 0], x1)
            iymin = np.maximum(boxes[:, 1], y1)
            ixmax = np.minimum(boxes[:, 2], x2)
            iymax = np.minimum(boxes[:, 3], y2)
            iw = np.maximum(ixmax - ixmin + 1.0, 0.0)
            ih = np.maximum(iymax - iymin + 1.0, 0.0)
            inters = iw * ih
            uni = ((x2 - x1 + 1.0) * (y2 - y1 + 1.0)
                   + (boxes[:, 2] - boxes[:, 0] + 1.0)
                   * (boxes[:, 3] - boxes[:, 1] + 1.0) - inters)
            overlaps = inters / uni
            ovmax = overlaps.max()
            jmax = int(overlaps.argmax())
        if ovmax > ovthresh:
            if not difficult[jmax]:
                if not marks[img_id][jmax]:
                    tp[d] = 1
                    marks[img_id][jmax] = True
                else:
                    fp[d] = 1
        else:
            fp[d] = 1
    fp = np.cumsum(fp)
    tp = np.cumsum(tp)
    rec = tp / float(max(npos, 1))
    prec = tp / np.maximum(tp + fp, np.finfo(np.float64).eps)
    return voc_ap(rec, prec, use_07_metric), rec, prec


def evaluate_boxes(dataset, all_boxes, output_dir):
    """dataset: JsonDataset over a VOC-converted json; all_boxes: reference
    [cls][img] (N, 5) arrays. Returns {'map': v, 'aps': {cls: ap}}."""
    use_07 = "voc_2007" in dataset.name
    image_ids = sorted(dataset.COCO.getImgIds())
    aps = {}
    for cls_ind, cls in enumerate(dataset.classes):
        if cls == "__background__":
            continue
        cat_id = dataset.category_to_id_map[cls]
        gt_by_img = {}
        for img_id in image_ids:
            anns = [a for a in dataset.COCO.img_to_anns[img_id]
                    if a["category_id"] == cat_id]
            if not anns:
                continue
            boxes = np.array(
                [[a["bbox"][0], a["bbox"][1],
                  a["bbox"][0] + a["bbox"][2] - 1,
                  a["bbox"][1] + a["bbox"][3] - 1] for a in anns])
            difficult = np.array(
                [bool(a.get("difficult", a.get("ignore", 0)))
                 for a in anns])
            gt_by_img[img_id] = (boxes, difficult)
        dets = []
        for i, img_id in enumerate(image_ids):
            d = all_boxes[cls_ind][i]
            if len(d) == 0:
                continue
            for row in d:
                dets.append((img_id, float(row[4]), float(row[0]),
                             float(row[1]), float(row[2]), float(row[3])))
        ap, _, _ = voc_eval_class(gt_by_img, dets, use_07_metric=use_07)
        aps[cls] = ap
        logger.info("VOC AP for %s = %.4f", cls, ap)
    mAP = float(np.mean(list(aps.values()))) if aps else 0.0
    logger.info("VOC mAP = %.4f", mAP)
    return {"map": mAP, "aps": aps, "use_07_metric": use_07}
