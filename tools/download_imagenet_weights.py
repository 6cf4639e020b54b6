#!/usr/bin/env python
"""Fetch caffe-style ImageNet-pretrained ResNet weights into
data/pretrained_model (CLI rebuild of tools/download_imagenet_weights.py).
This environment has no egress; when downloads fail the script prints where
to place the files manually."""

import argparse
import os

import _init_paths  # noqa: F401

from detectron_tpu.utils.io import cache_url
from detectron_tpu.utils.logging import setup_logging

logger = setup_logging(__name__)

URLS = {
    "resnet50_caffe.pth":
        "https://dl.fbaipublicfiles.com/detectron/resnet50_caffe.pth",
    "resnet101_caffe.pth":
        "https://dl.fbaipublicfiles.com/detectron/resnet101_caffe.pth",
    "resnet152_caffe.pth":
        "https://dl.fbaipublicfiles.com/detectron/resnet152_caffe.pth",
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--targetdir", default="data/pretrained_model")
    args = parser.parse_args()
    os.makedirs(args.targetdir, exist_ok=True)
    for name, url in URLS.items():
        dst = os.path.join(args.targetdir, name)
        if os.path.exists(dst):
            logger.info("%s already present", dst)
            continue
        try:
            cached = cache_url(url)
            os.replace(cached, dst)
            logger.info("Fetched %s", dst)
        except IOError as e:
            logger.warning("%s — place the file at %s manually", e, dst)


if __name__ == "__main__":
    main()
