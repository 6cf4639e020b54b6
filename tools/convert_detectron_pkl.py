#!/usr/bin/env python
"""Convert a Detectron/Caffe2 .pkl into a detectron_tpu checkpoint and print
a blob coverage report (which reference blobs mapped, which were unused, and
which params stayed at init). Run this first when validating AP parity
against released model-zoo weights."""

import argparse

import _init_paths  # noqa: F401

from detectron_tpu.core.config import (
    assert_and_infer_cfg, cfg, merge_cfg_from_file, merge_cfg_from_list)
from detectron_tpu.utils.logging import setup_logging

logger = setup_logging(__name__)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", dest="cfg_file", required=True)
    p.add_argument("--pkl", required=True, help="Detectron weights .pkl")
    p.add_argument("--out", required=True, help="output checkpoint dir")
    p.add_argument("--set", dest="set_cfgs", nargs="+", default=[])
    args = p.parse_args()

    import pickle

    import jax
    import numpy as np

    from detectron_tpu.models import model_builder as mb
    from detectron_tpu.utils import detectron_weight_helper as dwh
    from detectron_tpu.utils import net as net_utils

    merge_cfg_from_file(args.cfg_file)
    if args.set_cfgs:
        merge_cfg_from_list(args.set_cfgs)
    assert_and_infer_cfg(make_immutable=False)

    params = mb.init_model(jax.random.PRNGKey(0))
    mapping = dwh.full_weight_mapping()

    with open(args.pkl, "rb") as f:
        saved = pickle.load(f, encoding="latin1")
    blobs = saved.get("blobs", saved)

    mapped, missing = [], []
    for name, (path, transform) in mapping.items():
        if name in blobs:
            dwh._set_path(params, path, transform(np.asarray(blobs[name])))
            mapped.append(name)
        else:
            missing.append(name)
    momentum_blobs = [b for b in blobs if b.endswith("_momentum")]
    unused = sorted(set(blobs) - set(mapped) - set(momentum_blobs))

    logger.info("mapped %d/%d blobs", len(mapped), len(mapping))
    if missing:
        logger.warning("params left at init (no blob): %s", missing)
    if unused:
        logger.warning("reference blobs without a target (check mapping "
                       "tables!): %s", unused[:40])

    ckpt = net_utils.save_ckpt(args.out, 0, params,
                               meta={"source_pkl": args.pkl})
    logger.info("wrote %s", ckpt)


if __name__ == "__main__":
    main()
