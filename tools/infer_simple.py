#!/usr/bin/env python
"""Run detection on a folder of images and write visualizations
(CLI rebuild of tools/infer_simple.py)."""

import argparse
import glob
import os

import _init_paths  # noqa: F401

from detectron_tpu.core.config import (
    assert_and_infer_cfg, cfg, merge_cfg_from_file, merge_cfg_from_list)
from detectron_tpu.utils.logging import setup_logging

logger = setup_logging(__name__)


def parse_args():
    parser = argparse.ArgumentParser(description="Demo inference")
    parser.add_argument("--dataset", default="coco",
                        help="class-name set: coco | keypoints_coco")
    parser.add_argument("--cfg", dest="cfg_file", required=True)
    parser.add_argument("--load_ckpt")
    parser.add_argument("--load_detectron")
    parser.add_argument("--image_dir")
    parser.add_argument("--images", nargs="+")
    parser.add_argument("--output_dir", default="infer_outputs")
    parser.add_argument("--thresh", type=float, default=0.7)
    parser.add_argument("--ext", default="pdf")
    parser.add_argument("--set", dest="set_cfgs", nargs="+", default=[])
    return parser.parse_args()


def main():
    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np

    from detectron_tpu.core import test as test_ops
    from detectron_tpu.core import test_engine
    from detectron_tpu.data import dummy_datasets
    from detectron_tpu.utils import blob as blob_utils
    from detectron_tpu.utils import vis as vis_utils

    args = parse_args()
    merge_cfg_from_file(args.cfg_file)
    if args.set_cfgs:
        merge_cfg_from_list(args.set_cfgs)
    if args.dataset.startswith("keypoints_coco"):
        dataset = dummy_datasets.get_coco_dataset()
        cfg.MODEL.NUM_CLASSES = 2
    else:
        dataset = dummy_datasets.get_coco_dataset()
        cfg.MODEL.NUM_CLASSES = len(dataset.classes)
    assert_and_infer_cfg(make_immutable=False)

    params = test_engine.initialize_model_from_cfg(args)
    detect_fn = jax.jit(test_ops.detect_graph)

    if args.image_dir:
        image_list = sorted(glob.glob(os.path.join(args.image_dir, "*")))
    else:
        image_list = args.images
    os.makedirs(args.output_dir, exist_ok=True)

    for i, im_path in enumerate(image_list):
        im = cv2.imread(im_path)
        if im is None:
            continue
        blob, scale, im_info = blob_utils.get_image_blob(im)
        out = detect_fn(params, jnp.asarray(blob), jnp.asarray(im_info))
        out = jax.tree.map(np.asarray, out)
        cls_boxes, cls_segms, cls_keyps = \
            test_engine.device_outputs_to_image_results(
                out, 0, im_info, cfg.MODEL.NUM_CLASSES)
        logger.info("%d/%d %s", i + 1, len(image_list), im_path)
        vis_utils.vis_one_image(
            im, os.path.splitext(os.path.basename(im_path))[0],
            args.output_dir, cls_boxes, cls_segms, cls_keyps,
            thresh=args.thresh, dataset=dataset, show_class=True,
            ext=args.ext)


if __name__ == "__main__":
    main()
