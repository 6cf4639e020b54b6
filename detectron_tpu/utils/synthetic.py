"""Synthetic benchmark/profiling inputs shared by bench.py, tools/profile_net.py
and tools/stage_bench.py — one definition of the "trained-detector-like"
weight calibration so every measurement tool sees the same workload.

The calibration exists because random-init heads produce a pathological
work mix (reference behavior is defined by TRAINED weights): a uniform
81-way softmax sends every proposal over TEST.SCORE_THRESH for many
classes, and rpn_bbox_pred deltas with std ~50-90 rail at the bbox_transform
clip and decode to ~1300x0.25-px slivers. Both route the detection tail and
the RoIAlign ladder through escape hatches a trained detector almost never
takes. See PERF.md round-4 for the measured calibrated-vs-uncalibrated
delta on each path.
"""

import numpy as np


def calibrate_detector_params(params, rng=None):
    """In-place-ish calibration of random-init detector params toward a
    trained detector's output statistics. Returns the updated params dict.

    - cls_score bias: background +4.5 plus small fg noise, so per-class
      above-threshold counts resemble a trained detector's (~tens of
      boxes/class rather than ~1000).
    - rpn_bbox_pred scaled by 0.005, so proposal deltas have trained-like
      magnitude (std ~0.3) and proposals follow the clipped-anchor shape
      distribution (sliver count 0, fixup-rung traffic ~12%).
    """
    import jax.numpy as jnp

    if rng is None:
        rng = np.random.RandomState(0)
    b = np.asarray(params["box_outs"]["cls_score"]["b"]).copy()
    b[0] += 4.5
    b[1:] += rng.randn(b.size - 1).astype(np.float32) * 0.5
    params["box_outs"]["cls_score"]["b"] = jnp.asarray(b)
    for k in ("w", "b"):
        params["rpn"]["rpn_bbox_pred"][k] = (
            params["rpn"]["rpn_bbox_pred"][k] * 0.005)
    return params


def synthetic_train_batch(B, H, W, rng=None, im_scale=1.6):
    """A realistic synthetic training batch (COCO-like box count/sizes) at
    the given canvas — the same construction bench.py's train mode uses, so
    profiles and benchmarks measure the same step."""
    import jax.numpy as jnp

    from detectron_tpu.core.config import cfg

    if rng is None:
        rng = np.random.RandomState(0)
    G = cfg.TPU.MAX_GT_BOXES
    gt_boxes = np.zeros((B, G, 4), np.float32)
    gt_valid = np.zeros((B, G), bool)
    gt_classes = np.zeros((B, G), np.int32)
    for i in range(B):
        n = 4 + (i % 5)
        x1 = rng.uniform(0, W - 200, n)
        y1 = rng.uniform(0, H - 200, n)
        gt_boxes[i, :n] = np.stack(
            [x1, y1, x1 + rng.uniform(40, 190, n),
             y1 + rng.uniform(40, 190, n)], axis=1)
        gt_valid[i, :n] = True
        gt_classes[i, :n] = rng.randint(1, cfg.MODEL.NUM_CLASSES, n)
    images_np = rng.randn(B, H, W, 3).astype(np.float32) * 20.0
    if cfg.TPU.S2D_INPUT:
        from detectron_tpu.utils import blob as blob_utils
        images_np = blob_utils.space_to_depth(images_np)
    batch = {
        "images": jnp.asarray(images_np),
        "im_info": jnp.asarray(
            [[H - 32.0, W - 11.0, im_scale]] * B, jnp.float32),
        "gt_boxes": jnp.asarray(gt_boxes),
        "gt_classes": jnp.asarray(gt_classes),
        "gt_valid": jnp.asarray(gt_valid),
        "crowd_boxes": jnp.zeros((B, 2, 4), jnp.float32),
        "crowd_valid": jnp.zeros((B, 2), bool),
    }
    if cfg.MODEL.MASK_ON:
        Mg = cfg.TPU.GT_MASK_SIZE
        batch["gt_masks"] = jnp.asarray(
            (rng.rand(B, G, Mg, Mg) > 0.5).astype(np.float32))
    if cfg.MODEL.KEYPOINTS_ON:
        nk = cfg.KRCNN.NUM_KEYPOINTS
        kps = np.zeros((B, G, nk, 3), np.float32)
        kps[..., 0] = rng.uniform(0, W, (B, G, nk))
        kps[..., 1] = rng.uniform(0, H, (B, G, nk))
        kps[..., 2] = 2.0
        batch["gt_keypoints"] = jnp.asarray(kps)
    return batch
