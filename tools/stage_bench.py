#!/usr/bin/env python
"""Per-stage device timing for the inference pipeline on real hardware.

Times cumulative sub-graphs (features / +rpn / +proposals / +box head /
full detect) plus isolated ops, so each PERF.md lever can be measured on
its own. Every stage returns a SCALAR (jnp.sum) — the axon tunnel moves
~bytes/ms, so reading a real output back would dominate the timing.
Synchronization is the scalar readback itself (block_until_ready does not
fence on the tunnel).
"""

import argparse
import functools
import time

import numpy as np

import _init_paths  # noqa: F401

from detectron_tpu.core.config import (
    assert_and_infer_cfg, cfg, merge_cfg_from_list)

print = functools.partial(print, flush=True)


def timeit(fn, args, n=8):
    out = fn(*args)
    np.asarray(out)  # compile + sync (scalar)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        np.asarray(out)
    return (time.perf_counter() - t0) / n * 1000.0


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from detectron_tpu.core import test as test_ops
    from detectron_tpu.core.configs_presets import mask_rcnn_r50_fpn
    from detectron_tpu.models import model_builder as mb
    from detectron_tpu.ops import nms as nms_ops

    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--skip_cumulative", action="store_true")
    p.add_argument("--set", dest="set_cfgs", nargs="+", default=[])
    args = p.parse_args()

    mask_rcnn_r50_fpn()
    merge_cfg_from_list(["TPU.COMPUTE_DTYPE", "bfloat16"] + args.set_cfgs)
    assert_and_infer_cfg(make_immutable=False)

    B = args.batch_size
    H, W = 832, 1344
    rng = np.random.RandomState(0)
    params = mb.init_model(jax.random.PRNGKey(0))
    images = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32) * 20)
    im_info = jnp.asarray([[800.0, 1333.0, 1.6]] * B, jnp.float32)

    # dispatch floor: a trivial program through the tunnel
    tiny = jax.jit(lambda x: x + 1.0)
    floor = timeit(tiny, (jnp.zeros((8,), jnp.float32),), n=16)
    print("dispatch floor: {:.1f} ms".format(floor))

    def feats(params, images):
        f, s = mb.forward_features(params, images)
        return sum(jnp.sum(x.astype(jnp.float32)) for x in f)

    def body_only(params, images):
        from detectron_tpu.models import resnet
        spec = mb.build_spec()
        dtype = jnp.bfloat16
        outs = resnet.apply_body(params["body"], images.astype(dtype),
                                 spec.num_stages)
        return jnp.sum(outs[-1].astype(jnp.float32))

    def rpn(params, images):
        f, s = mb.forward_features(params, images)
        outs = mb.forward_rpn(params, f)
        return sum(jnp.sum(c.astype(jnp.float32)) +
                   jnp.sum(b.astype(jnp.float32)) for c, b in outs)

    def props(params, images, im_info):
        f, s = mb.forward_features(params, images)
        outs = mb.forward_rpn(params, f)
        rois, _, valid = mb.generate_proposals(outs, f, im_info, False)
        return jnp.sum(rois) + jnp.sum(valid)

    def boxes(params, images, im_info):
        f, s = mb.forward_features(params, images)
        outs = mb.forward_rpn(params, f)
        rois, _, valid = mb.generate_proposals(outs, f, im_info, False)
        cls_logits, bbox_pred, _ = mb.forward_box_outputs(params, f, s, rois)
        return jnp.sum(cls_logits.astype(jnp.float32))

    def full(params, images, im_info):
        out = test_ops.detect_graph(params, images, im_info)
        return (jnp.sum(out["scores"]) + jnp.sum(out["boxes"]) +
                jnp.sum(out["mask_probs"]))

    def detect_nomask(params, images, im_info):
        # Same graph with MASK_ON toggled off at TRACE time (cfg is a
        # plain python object; the jit traces whatever it reads).
        prev = cfg.MODEL.MASK_ON
        cfg.MODEL.MASK_ON = False
        try:
            out = test_ops.detect_graph(params, images, im_info)
        finally:
            cfg.MODEL.MASK_ON = prev
        return jnp.sum(out["scores"]) + jnp.sum(out["boxes"])

    stages = [
        ("body only (s2d={})".format(cfg.TPU.S2D_STEM),
         jax.jit(body_only), (params, images)),
        ("features (body+FPN)", jax.jit(feats), (params, images)),
        ("+ rpn heads", jax.jit(rpn), (params, images)),
        ("+ proposals", jax.jit(props), (params, images, im_info)),
        ("+ box head", jax.jit(boxes), (params, images, im_info)),
        ("+ decode/NMS (no mask)", jax.jit(detect_nomask),
         (params, images, im_info)),
        ("full detect", jax.jit(full), (params, images, im_info)),
    ]
    if not args.skip_cumulative:
        prev = floor
        for name, fn, a in stages:
            ms = timeit(fn, a, n=args.iters)
            print("{:<22} {:8.1f} ms  (+{:.1f})".format(name, ms - floor,
                                                        ms - prev))
            prev = ms

    # isolated: RPN-level NMS (1000 presorted boxes per image, per level)
    bx = jnp.asarray(np.abs(rng.randn(B, 1000, 4)).astype(np.float32) * 100)
    bx = jnp.concatenate([bx[..., :2], bx[..., :2] + bx[..., 2:]], -1)
    sc = -jnp.sort(-jnp.asarray(rng.rand(B, 1000).astype(np.float32)), 1)

    def nms_lvl(b, s):
        idx, valid = nms_ops.nms_batched_sorted(
            b, s, 0.7, 1000, tile_size=cfg.TPU.NMS_TILE_SIZE)
        return jnp.sum(idx) + jnp.sum(valid)

    t = timeit(jax.jit(nms_lvl), (bx, sc), n=args.iters)
    print("RPN NMS 1000->1000 x{} ({}): {:.1f} ms".format(
        B, cfg.TPU.NMS_IMPL, t - floor))

    # isolated: detection-tail per-class NMS (B*(C-1) lanes of K=400)
    C1, K = 80, 400
    bx2 = jnp.asarray(
        np.abs(rng.randn(B * C1, K, 4)).astype(np.float32) * 50)
    bx2 = jnp.concatenate([bx2[..., :2], bx2[..., :2] + bx2[..., 2:]], -1)
    sc2 = -jnp.sort(-jnp.asarray(
        rng.rand(B * C1, K).astype(np.float32)), 1)

    def nms_tail(b, s):
        idx, valid = nms_ops.nms_batched_sorted(
            b, s, 0.5, 100, tile_size=cfg.TPU.NMS_TILE_SIZE)
        return jnp.sum(idx) + jnp.sum(valid)

    t = timeit(jax.jit(nms_tail), (bx2, sc2), n=args.iters)
    print("tail NMS {}x{}->100 ({}): {:.1f} ms".format(
        B * C1, K, cfg.TPU.NMS_IMPL, t - floor))

    # isolated: top-k over a P2-sized score map
    n = 208 * 336 * 3
    s = jnp.asarray(rng.randn(B, n).astype(np.float32))
    t_lax = timeit(jax.jit(lambda x: jnp.sum(jax.lax.top_k(x, 1000)[0])),
                   (s,), n=args.iters)
    print("topk 210k->1000 x{}: lax {:.1f} ms".format(B, t_lax - floor))


if __name__ == "__main__":
    main()
