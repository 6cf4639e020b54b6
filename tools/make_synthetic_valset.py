#!/usr/bin/env python
"""Generate the synthetic COCO val set used for end-to-end eval-loop
measurements (PERF.md round-4/round-5 eval tables; no real COCO images
exist in this environment).

Produces <out>/coco/val2017/*.jpg (noise images at COCO-typical sizes,
mixed landscape/portrait) + instances_val2017.json with a few boxes/masks
per image, sized so TEST.SCALE=800/MAX_SIZE=1333 maps them onto the
production 832x1344 canvas.

Usage: python tools/make_synthetic_valset.py --out /tmp/evalset [--n 192]
"""

import argparse
import json
import os

import cv2
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=192)
    args = ap.parse_args()

    img_dir = os.path.join(args.out, "coco", "val2017")
    ann_dir = os.path.join(args.out, "coco", "annotations")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)

    rng = np.random.RandomState(0)
    # COCO-typical source sizes (val2017 median ~640x480, mixed aspect).
    sizes = [(480, 640), (426, 640), (640, 480), (500, 375), (612, 612),
             (375, 500), (480, 640), (427, 640)]
    images, annotations = [], []
    ann_id = 1
    for i in range(args.n):
        h, w = sizes[i % len(sizes)]
        fn = "{:012d}.jpg".format(i + 1)
        cv2.imwrite(os.path.join(img_dir, fn),
                    rng.randint(0, 255, (h, w, 3), np.uint8))
        images.append({"id": i + 1, "width": w, "height": h,
                       "file_name": fn})
        for _ in range(3 + i % 3):
            bw, bh = rng.uniform(30, w / 2), rng.uniform(30, h / 2)
            x1 = rng.uniform(0, w - bw)
            y1 = rng.uniform(0, h - bh)
            annotations.append({
                "id": ann_id, "image_id": i + 1,
                "category_id": int(rng.randint(1, 81)),
                "bbox": [float(x1), float(y1), float(bw), float(bh)],
                "area": float(bw * bh), "iscrowd": 0,
                "segmentation": [[float(x1), float(y1),
                                  float(x1 + bw), float(y1),
                                  float(x1 + bw), float(y1 + bh),
                                  float(x1), float(y1 + bh)]],
            })
            ann_id += 1
    cats = [{"id": k, "name": "c%d" % k, "supercategory": "x"}
            for k in range(1, 81)]
    gt = {"images": images, "annotations": annotations, "categories": cats}
    with open(os.path.join(ann_dir, "instances_val2017.json"), "w") as f:
        json.dump(gt, f)
    print("wrote {} images, {} annotations under {}".format(
        args.n, len(annotations), args.out))


if __name__ == "__main__":
    main()
