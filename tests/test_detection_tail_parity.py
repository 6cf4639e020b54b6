"""The in-graph per-class NMS + top-D limit must reproduce the reference's
host box_results_with_nms_and_limit (hard-NMS mode)."""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from detectron_tpu.core import config
from detectron_tpu.core.config import cfg
from detectron_tpu.core import test as test_ops
from detectron_tpu.ops import box_ops


def test_per_class_nms_and_limit_matches_host():
    config.merge_cfg_from_list([
        "MODEL.NUM_CLASSES", "6",
        "TEST.NMS", "0.5",
        "TEST.SCORE_THRESH", "0.05",
        "TEST.DETECTIONS_PER_IM", "10",
        "TPU.NMS_TILE_SIZE", "32",
    ])
    rng = np.random.RandomState(0)
    R, C = 80, 6
    # Random rois + per-class jittered boxes and dirichlet-ish scores
    rois = rng.uniform(0, 150, (R, 4)).astype(np.float32)
    rois[:, 2:] = rois[:, :2] + rng.uniform(10, 60, (R, 2))
    scores = rng.dirichlet(np.ones(C) * 0.2, size=R).astype(np.float32)
    boxes_per_class = np.tile(rois, (1, C)).astype(np.float32)
    boxes_per_class += rng.uniform(-2, 2, boxes_per_class.shape).astype(
        np.float32)
    boxes_per_class = np.maximum(boxes_per_class, 0)

    # ---- host reference
    s_out, b_out, cls_boxes = test_ops.box_results_with_nms_and_limit(
        scores, boxes_per_class)

    # ---- in-graph tail (replicating detect_graph's NMS section)
    D = cfg.TEST.DETECTIONS_PER_IM
    cls_boxes_j = jnp.asarray(boxes_per_class).reshape(R, C, 4)[:, 1:, :]
    cls_scores = jnp.asarray(scores)[:, 1:]
    thresh_scores = jnp.where(cls_scores >= cfg.TEST.SCORE_THRESH,
                              cls_scores, -jnp.inf)
    boxes_c = jnp.swapaxes(cls_boxes_j, 0, 1)
    scores_c = jnp.swapaxes(thresh_scores, 0, 1)
    K = min(scores_c.shape[-1], max(4 * D, 128))
    top_s, top_i = jax.lax.top_k(scores_c, K)
    top_b = jnp.take_along_axis(boxes_c, top_i[..., None], axis=1)
    idx_k, valid = test_ops._per_class_nms_one_image(top_b, top_s, D)
    kept_scores = jnp.where(
        valid, jnp.take_along_axis(top_s, idx_k, axis=1), -jnp.inf)
    kept_boxes = jnp.take_along_axis(top_b, idx_k[..., None], axis=1)
    flat_scores = np.asarray(kept_scores).reshape(-1)
    flat_boxes = np.asarray(kept_boxes).reshape(-1, 4)
    order = np.argsort(-flat_scores)[:D]
    graph_scores = flat_scores[order]
    graph_boxes = flat_boxes[order]
    graph_valid = np.isfinite(graph_scores)
    graph_scores = graph_scores[graph_valid]
    graph_boxes = graph_boxes[graph_valid]

    # Host result, sorted by score, limited to D
    host_order = np.argsort(-s_out)[:D]
    host_scores = s_out[host_order]
    host_boxes = b_out[host_order]

    assert len(graph_scores) == len(host_scores)
    np.testing.assert_allclose(np.sort(graph_scores)[::-1],
                               np.sort(host_scores)[::-1], rtol=1e-5)
    # Boxes match when paired by score
    gs = np.argsort(-graph_scores)
    hs = np.argsort(-host_scores)
    np.testing.assert_allclose(graph_boxes[gs], host_boxes[hs], rtol=1e-4,
                               atol=1e-3)
