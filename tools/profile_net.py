#!/usr/bin/env python
"""Profile the detection or training graph with the JAX/XLA profiler.

Writes a TensorBoard-compatible xplane trace (view with
tensorboard --logdir <out> and the profile plugin). This is the TPU-native
upgrade of the reference's wall-clock-only timers (lib/utils/timer.py).
"""

import argparse

import numpy as np

import _init_paths  # noqa: F401

from detectron_tpu.core.config import (
    assert_and_infer_cfg, cfg, merge_cfg_from_file, merge_cfg_from_list)


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", dest="cfg_file")
    p.add_argument("--mode", choices=["infer", "train"], default="infer")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--out", default="/tmp/detectron_tpu_profile")
    p.add_argument("--set", dest="set_cfgs", nargs="+", default=[])
    p.add_argument("--calibrate", action="store_true",
                   help="apply bench.py's trained-detector weight "
                        "calibration so the profile sees the production "
                        "work mix (utils/synthetic.py)")
    return p.parse_args()


def main():
    import jax
    import jax.numpy as jnp

    from detectron_tpu.core import test as test_ops
    from detectron_tpu.core.configs_presets import mask_rcnn_r50_fpn
    from detectron_tpu.models import model_builder as mb

    args = parse_args()
    if args.cfg_file:
        merge_cfg_from_file(args.cfg_file)
    else:
        mask_rcnn_r50_fpn()
    merge_cfg_from_list(["TPU.COMPUTE_DTYPE", "bfloat16"] + args.set_cfgs)
    assert_and_infer_cfg(make_immutable=False)

    B = args.batch_size
    H, W = 832, 1344
    rng = np.random.RandomState(0)
    params = mb.init_model(jax.random.PRNGKey(0))
    if args.calibrate:
        from detectron_tpu.utils.synthetic import calibrate_detector_params
        params = calibrate_detector_params(params, rng)
    dt = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    images_np = rng.randn(B, H, W, 3).astype(np.float32) * 20
    if cfg.TPU.S2D_INPUT:
        from detectron_tpu.utils import blob as blob_utils
        images_np = blob_utils.space_to_depth(images_np)
    images = jnp.asarray(images_np, dtype=dt if args.mode == "infer"
                         else jnp.float32)
    im_info = jnp.asarray([[800.0, 1333.0, 1.6]] * B, jnp.float32)

    if args.mode == "infer":
        fn = jax.jit(test_ops.detect_graph)
        out = fn(params, images, im_info)
        np.asarray(out["scores"])  # warm
        with jax.profiler.trace(args.out):
            for _ in range(args.steps):
                out = fn(params, images, im_info)
                np.asarray(out["scores"])
    else:
        from detectron_tpu.parallel import optimizer as opt
        from detectron_tpu.parallel import train_step as ts
        from detectron_tpu.utils.synthetic import synthetic_train_batch

        # Realistic COCO-like gt boxes (the old all-zero-gt batch skipped
        # most of the target-assignment and head-loss work).
        batch = synthetic_train_batch(B, H, W, rng)
        opt_state = opt.init_opt_state(params)
        step = jax.jit(ts.train_step)
        params, opt_state, stats = step(params, opt_state, batch,
                                        jax.random.PRNGKey(1))
        np.asarray(stats["loss"])
        with jax.profiler.trace(args.out):
            for i in range(args.steps):
                params, opt_state, stats = step(
                    params, opt_state, batch, jax.random.PRNGKey(i))
                np.asarray(stats["loss"])
    print("Trace written to", args.out)


if __name__ == "__main__":
    main()
