#!/usr/bin/env python
"""Evaluate a model on a dataset (CLI rebuild of tools/test_net.py)."""

import argparse
import os

import _init_paths  # noqa: F401

from detectron_tpu.core.config import (
    assert_and_infer_cfg, cfg, merge_cfg_from_file, merge_cfg_from_list)
from detectron_tpu.utils.logging import setup_logging

logger = setup_logging(__name__)


def parse_args():
    parser = argparse.ArgumentParser(description="Test a detection model")
    parser.add_argument("--dataset", help="coco2017 | keypoints_coco2017 | ...")
    parser.add_argument("--cfg", dest="cfg_file", required=False)
    parser.add_argument("--load_ckpt", help="checkpoint dir")
    parser.add_argument("--load_detectron", help="Detectron .pkl weights")
    parser.add_argument("--output_dir", default=None)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--multi-gpu-testing", dest="multi_gpu_testing",
                        action="store_true",
                        help="accepted for CLI parity; the mesh shards eval "
                             "automatically")
    parser.add_argument("--vis", action="store_true")
    parser.add_argument("--range", nargs=2, type=int, default=None,
                        help="image index range [start end)")
    parser.add_argument("--set", dest="set_cfgs", nargs="+", default=[])
    return parser.parse_args()


DATASET_MAP = {
    "coco2017": "coco_2017_val",
    "coco2014": "coco_2014_minival",
    "keypoints_coco2017": "keypoints_coco_2017_val",
    "keypoints_coco2014": "keypoints_coco_2014_minival",
    "voc2007": "voc_2007_test",
    "voc2012": "voc_2012_trainval",
}


def main():
    from detectron_tpu.core import test_engine

    args = parse_args()
    if args.cfg_file:
        merge_cfg_from_file(args.cfg_file)
    if args.set_cfgs:
        merge_cfg_from_list(args.set_cfgs)
    dataset_name = DATASET_MAP.get(args.dataset, args.dataset) or \
        (cfg.TEST.DATASETS[0] if cfg.TEST.DATASETS else None)
    if args.dataset and "keypoints" in args.dataset:
        cfg.MODEL.NUM_CLASSES = 2
    elif args.dataset and "coco" in args.dataset:
        cfg.MODEL.NUM_CLASSES = 81
    elif args.dataset and "voc" in args.dataset:
        cfg.MODEL.NUM_CLASSES = 21
    assert_and_infer_cfg(make_immutable=False)

    output_dir = args.output_dir or os.path.join(
        cfg.OUTPUT_DIR, "test",
        os.path.splitext(os.path.basename(args.cfg_file or "default"))[0])
    os.makedirs(output_dir, exist_ok=True)
    results = test_engine.run_inference(
        args, dataset_name=dataset_name, output_dir=output_dir,
        batch_size=args.batch_size,
        check_expected_results=bool(cfg.EXPECTED_RESULTS),
        ind_range=args.range)
    logger.info("Results: %s", results)


if __name__ == "__main__":
    main()
