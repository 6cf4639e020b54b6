"""Minimal COCO JSON API (pycocotools.coco.COCO replacement).

pycocotools is not present in this environment, so the framework parses COCO
annotation JSON directly. Only the surface the pipeline needs: images,
annotations indexed by image, categories, and result loading for evaluation.
"""

import json
from collections import defaultdict


class COCO:
    def __init__(self, annotation_file=None):
        self.dataset = {}
        self.anns = {}
        self.imgs = {}
        self.cats = {}
        self.img_to_anns = defaultdict(list)
        self.cat_to_imgs = defaultdict(list)
        if annotation_file is not None:
            with open(annotation_file, "r") as f:
                self.dataset = json.load(f)
            self.create_index()

    def create_index(self):
        for ann in self.dataset.get("annotations", []):
            self.anns[ann["id"]] = ann
            self.img_to_anns[ann["image_id"]].append(ann)
            if "category_id" in ann:
                self.cat_to_imgs[ann["category_id"]].append(ann["image_id"])
        for img in self.dataset.get("images", []):
            self.imgs[img["id"]] = img
        for cat in self.dataset.get("categories", []):
            self.cats[cat["id"]] = cat

    # -- pycocotools-compatible accessors -------------------------------
    def getImgIds(self):
        return sorted(self.imgs.keys())

    def getCatIds(self, catNms=None):
        cats = self.dataset.get("categories", [])
        if catNms:
            cats = [c for c in cats if c["name"] in catNms]
        return sorted(c["id"] for c in cats)

    def getAnnIds(self, imgIds=None, iscrowd=None):
        if imgIds is not None:
            if not isinstance(imgIds, (list, tuple)):
                imgIds = [imgIds]
            anns = [a for i in imgIds for a in self.img_to_anns[i]]
        else:
            anns = list(self.anns.values())
        if iscrowd is not None:
            anns = [a for a in anns if a.get("iscrowd", 0) == iscrowd]
        return [a["id"] for a in anns]

    def loadAnns(self, ids):
        if not isinstance(ids, (list, tuple)):
            ids = [ids]
        return [self.anns[i] for i in ids]

    def loadImgs(self, ids):
        if not isinstance(ids, (list, tuple)):
            ids = [ids]
        return [self.imgs[i] for i in ids]

    def loadCats(self, ids):
        if not isinstance(ids, (list, tuple)):
            ids = [ids]
        return [self.cats[i] for i in ids]

    def loadRes(self, results):
        """Load detection results (list of dicts or a json path) into a new
        COCO object sharing this one's images/categories."""
        res = COCO()
        res.dataset["images"] = list(self.dataset.get("images", []))
        res.dataset["categories"] = list(self.dataset.get("categories", []))
        if isinstance(results, str):
            with open(results, "r") as f:
                anns = json.load(f)
        else:
            anns = results
        for i, ann in enumerate(anns):
            ann = dict(ann)
            ann["id"] = i + 1
            if "bbox" in ann and "area" not in ann:
                ann["area"] = ann["bbox"][2] * ann["bbox"][3]
            if "segmentation" in ann and "area" not in ann:
                from detectron_tpu.data import rle as mask_util
                ann["area"] = mask_util.area(ann["segmentation"])
            if "keypoints" in ann and "area" not in ann:
                # pycocotools loadRes: area/bbox from the keypoint extent
                import numpy as np
                k = np.asarray(ann["keypoints"])
                xs, ys = k[0::3], k[1::3]
                x0, x1_, y0, y1_ = xs.min(), xs.max(), ys.min(), ys.max()
                ann["area"] = float((x1_ - x0) * (y1_ - y0))
                ann["bbox"] = [float(x0), float(y0), float(x1_ - x0),
                               float(y1_ - y0)]
            ann.setdefault("iscrowd", 0)
            res.dataset.setdefault("annotations", []).append(ann)
        res.create_index()
        return res
