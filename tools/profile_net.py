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
    images = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32) * 20)
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

        G = cfg.TPU.MAX_GT_BOXES
        batch = {
            "images": images,
            "im_info": im_info,
            "gt_boxes": jnp.zeros((B, G, 4), jnp.float32),
            "gt_classes": jnp.zeros((B, G), jnp.int32),
            "gt_valid": jnp.zeros((B, G), bool).at[:, 0].set(True),
            "crowd_boxes": jnp.zeros((B, 2, 4), jnp.float32),
            "crowd_valid": jnp.zeros((B, 2), bool),
        }
        if cfg.MODEL.MASK_ON:
            batch["gt_masks"] = jnp.zeros(
                (B, G, cfg.TPU.GT_MASK_SIZE, cfg.TPU.GT_MASK_SIZE),
                jnp.float32)
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
