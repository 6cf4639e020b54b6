"""Cityscapes instance-segmentation evaluation.

Rebuilds lib/datasets/cityscapes_json_dataset_evaluator.py + the
lib/datasets/cityscapes/coco_to_cityscapes_id.py remap. The reference shells
out to cityscapesscripts' evalInstanceLevelSemanticLabeling on dumped .txt
masks; that package is not in this image, so the evaluation itself runs
through the COCO protocol over the cityscapes-converted json (the standard
instancesonly_filtered_gtFine jsons are COCO-format), which yields the same
AP@[.5:.95] matching semantics. The id remap and mask dumping surface are
preserved for parity.
"""

import logging
import os

import numpy as np

logger = logging.getLogger(__name__)

# model trained on COCO classes -> cityscapes instance classes
# (reference: lib/datasets/cityscapes/coco_to_cityscapes_id.py)
def cityscapes_to_coco(cityscapes_id):
    lookup = {
        "person": 1, "rider": -1, "car": 3, "truck": 8, "bus": 6,
        "train": 7, "motorcycle": 4, "bicycle": 2,
    }
    return lookup


def coco_to_cityscapes_id(coco_cat_name):
    lookup = {
        "person": 24, "rider": 25, "car": 26, "truck": 27, "bus": 28,
        "train": 31, "motorcycle": 32, "bicycle": 33,
    }
    return lookup.get(coco_cat_name, -1)


def evaluate_boxes(dataset, all_boxes, output_dir):
    from detectron_tpu.data import json_dataset_evaluator

    return json_dataset_evaluator.evaluate_boxes(
        dataset, all_boxes, output_dir)


def evaluate_masks(dataset, all_boxes, all_segms, output_dir):
    """Instance-seg AP over the cityscapes json via the COCO protocol; also
    dumps cityscapesscripts-format .txt/.png results for offline official
    evaluation when the raw toolkit is available."""
    from detectron_tpu.data import json_dataset_evaluator

    _dump_cityscapes_txt(dataset, all_boxes, all_segms, output_dir)
    return json_dataset_evaluator.evaluate_masks(
        dataset, all_boxes, all_segms, output_dir)


def _dump_cityscapes_txt(dataset, all_boxes, all_segms, output_dir):
    """Write per-image result .txt + instance mask .pngs in the layout
    cityscapesscripts' evalInstanceLevelSemanticLabeling consumes."""
    import cv2

    from detectron_tpu.data import rle as mask_util

    res_dir = os.path.join(output_dir, "cityscapes_results")
    os.makedirs(res_dir, exist_ok=True)
    image_ids = sorted(dataset.COCO.getImgIds())
    for i, img_id in enumerate(image_ids):
        info = dataset.COCO.imgs[img_id]
        base = os.path.splitext(os.path.basename(info["file_name"]))[0]
        lines = []
        inst = 0
        for cls_ind, cls in enumerate(dataset.classes):
            if cls == "__background__":
                continue
            cs_id = coco_to_cityscapes_id(cls)
            boxes = all_boxes[cls_ind][i]
            segms = all_segms[cls_ind][i] if all_segms else []
            for k in range(len(boxes)):
                if k >= len(segms):
                    break
                score = float(boxes[k][-1])
                mask = mask_util.decode(segms[k])
                png = "{}_{}.png".format(base, inst)
                cv2.imwrite(os.path.join(res_dir, png), mask * 255)
                lines.append("{} {} {:.6f}".format(
                    png, cs_id if cs_id > 0 else cls_ind, score))
                inst += 1
        with open(os.path.join(res_dir, base + ".txt"), "w") as f:
            f.write("\n".join(lines))
    logger.info("Cityscapes-format results dumped to %s", res_dir)
