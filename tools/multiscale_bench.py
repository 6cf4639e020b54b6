#!/usr/bin/env python
"""X-152-32x8d multi-scale training cost on real TPU (VERDICT r4 ask #4).

Runs the flagship BASELINE config #5 training step at several of its
TRAIN.SCALES canvases (the restored 6-scale schedule draws one scale per
step — data/loader.py emits one static orientation-bucketed canvas per
scale, so each distinct canvas costs ONE XLA compile, then steps at that
scale reuse it). This measures, per scale: compile(+cache-write) wall time,
steady-state s/step and img/s at batch 2 with TPU.REMAT_BODY, matching
PERF.md's round-2 single-scale X-152 row.

Usage:
  python tools/multiscale_bench.py [--scales 640 800] [--bs 2] [--iters 4]

Reference anchor: lib/roi_data/minibatch.py :: _get_image_blob (uniform
scale draw), configs/.../e2e_mask_rcnn_X-152-32x8d-FPN-IN5k_1.44x.yaml.
"""

import argparse
import json
import os
import time

import numpy as np

import _init_paths  # noqa: F401 (adds repo root + enables compile cache)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", type=int, nargs="+", default=[640, 800])
    ap.add_argument("--bs", type=int, default=2)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--cfg", default=os.path.join(
        os.path.dirname(__file__), "..", "configs", "baselines",
        "e2e_mask_rcnn_X-152-32x8d-FPN-IN5k_1.44x.yaml"))
    args = ap.parse_args()

    import jax

    from detectron_tpu.core import config
    from detectron_tpu.models import model_builder as mb
    from detectron_tpu.parallel import optimizer as opt
    from detectron_tpu.parallel import train_step as ts
    from detectron_tpu.utils import blob as blob_utils
    from detectron_tpu.utils.synthetic import synthetic_train_batch

    config.merge_cfg_from_file(args.cfg)
    config.merge_cfg_from_list([
        "TPU.COMPUTE_DTYPE", "bfloat16",
        "TPU.REMAT_BODY", "True",
    ])
    config.assert_and_infer_cfg(make_immutable=False)
    for s in args.scales:
        assert s in config.cfg.TRAIN.SCALES, (s, config.cfg.TRAIN.SCALES)

    params = mb.init_model(jax.random.PRNGKey(0))
    opt_state = opt.init_opt_state(params)
    step = jax.jit(ts.train_step, donate_argnums=(0, 1))

    rows = []
    for s in args.scales:
        H, W = blob_utils.static_canvas(s, config.cfg.TRAIN.MAX_SIZE,
                                        landscape=True)
        batch = synthetic_train_batch(args.bs, H, W,
                                      np.random.RandomState(0),
                                      im_scale=s / 500.0)
        t0 = time.perf_counter()
        params, opt_state, stats = step(params, opt_state, batch,
                                        jax.random.PRNGKey(1))
        loss0 = float(np.asarray(stats["loss"]))  # readback = tunnel fence
        compile_s = time.perf_counter() - t0

        # Steady state with the deferred-readback pipelining the trainers
        # use (read step i-1's loss while step i runs).
        prev = stats
        t0 = time.perf_counter()
        for i in range(args.iters):
            params, opt_state, stats = step(params, opt_state, batch,
                                            jax.random.PRNGKey(2 + i))
            np.asarray(prev["loss"])
            prev = stats
        np.asarray(prev["loss"])
        dt = (time.perf_counter() - t0) / args.iters
        rows.append({"scale": s, "canvas": [H, W],
                     "compile_s": round(compile_s, 1),
                     "s_per_step": round(dt, 3),
                     "img_per_s": round(args.bs / dt, 2),
                     "loss0": round(loss0, 2)})
        print(json.dumps(rows[-1]), flush=True)

    # Interleave check: re-dispatch each scale once — all executables stay
    # live, so a multi-scale stream pays compile once per canvas, not per
    # scale switch.
    t0 = time.perf_counter()
    for s, row in zip(args.scales, rows):
        H, W = row["canvas"]
        batch = synthetic_train_batch(args.bs, H, W,
                                      np.random.RandomState(1),
                                      im_scale=s / 500.0)
        params, opt_state, stats = step(params, opt_state, batch,
                                        jax.random.PRNGKey(9))
        np.asarray(stats["loss"])
    print(json.dumps({"interleave_total_s": round(
        time.perf_counter() - t0, 2), "scales": args.scales}), flush=True)


if __name__ == "__main__":
    main()
