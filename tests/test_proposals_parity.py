"""The in-graph proposal generator must reproduce the reference's host
pipeline (sigmoid -> top-k -> decode -> clip -> min-size filter -> greedy
NMS -> top-N) exactly — this is the most AP-critical dynamic->static
conversion (SURVEY.md hard part #1)."""

import numpy as np
import jax
import jax.numpy as jnp

from detectron_tpu.core import config
from detectron_tpu.core.config import cfg
from detectron_tpu.models import rpn as rpn_mod
from detectron_tpu.ops import anchors as anchor_ops
from detectron_tpu.utils import boxes as box_utils


def _host_reference(cls_logits, bbox_pred, anchors, im_hw, pre_n, post_n,
                    nms_thresh, min_size):
    """Numpy transcription of GenerateProposalsOp semantics."""
    H, W, A = cls_logits.shape
    scores = 1.0 / (1.0 + np.exp(-cls_logits.reshape(-1).astype(np.float64)))
    deltas = bbox_pred.reshape(-1, 4).astype(np.float32)

    order = np.argsort(-scores, kind="stable")[:pre_n]
    scores = scores[order]
    boxes = box_utils.bbox_transform(anchors[order], deltas[order],
                                     (1.0, 1.0, 1.0, 1.0))
    boxes = box_utils.clip_boxes_to_image(boxes, im_hw[0], im_hw[1])
    keep = box_utils.filter_small_boxes(boxes, min_size)
    boxes, scores = boxes[keep], scores[keep]
    keep = box_utils.nms(
        np.hstack([boxes, scores[:, None]]).astype(np.float32), nms_thresh)
    keep = keep[:post_n]
    return boxes[keep], scores[keep]


def test_proposals_match_host_reference():
    config.merge_cfg_from_list(["TPU.NMS_TILE_SIZE", "64"])
    rng = np.random.RandomState(0)
    H, W, A = 12, 16, 3
    stride, sizes, ratios = 16, (64, 128, 256), (0.5, 1, 2)
    # A = len(sizes)*len(ratios) = 9 actually; use all 9
    A = 9
    cls_logits = rng.randn(H, W, A).astype(np.float32)
    bbox_pred = (rng.randn(H, W, 4 * A) * 0.5).astype(np.float32)
    anchors_np = anchor_ops.anchor_field(stride, sizes, ratios, H, W)
    im_hw = (150.0, 200.0)
    pre_n, post_n, thr, min_size = 64, 16, 0.7, 0.0

    ref_boxes, ref_scores = _host_reference(
        cls_logits, bbox_pred, anchors_np, im_hw, pre_n, post_n, thr,
        min_size)

    out_boxes, out_scores, valid = rpn_mod.proposals_one_level(
        jnp.asarray(cls_logits), jnp.asarray(bbox_pred),
        jnp.asarray(anchors_np), jnp.asarray(im_hw), min_size,
        pre_top_n=pre_n, post_top_n=post_n, nms_thresh=thr)
    out_boxes = np.asarray(out_boxes)[np.asarray(valid)]
    out_scores = np.asarray(out_scores)[np.asarray(valid)]

    assert len(out_boxes) == len(ref_boxes)
    np.testing.assert_allclose(out_boxes, ref_boxes, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(out_scores, ref_scores, rtol=1e-5, atol=1e-5)


def test_proposals_min_size_filter():
    config.merge_cfg_from_list(["TPU.NMS_TILE_SIZE", "64"])
    rng = np.random.RandomState(1)
    H, W, A = 8, 8, 9
    cls_logits = rng.randn(H, W, A).astype(np.float32)
    # Huge negative dw/dh -> tiny boxes that the min-size filter must kill
    bbox_pred = np.full((H, W, 4 * A), -3.0, np.float32)
    anchors_np = anchor_ops.anchor_field(16, (64, 128, 256), (0.5, 1, 2),
                                         H, W)
    out_boxes, out_scores, valid = rpn_mod.proposals_one_level(
        jnp.asarray(cls_logits), jnp.asarray(bbox_pred),
        jnp.asarray(anchors_np), jnp.asarray((128.0, 128.0)), 20.0,
        pre_top_n=32, post_top_n=8, nms_thresh=0.7)
    # every decoded box has w/h ~ exp(-3)*anchor < 20 except the largest
    kept = np.asarray(valid).sum()
    b = np.asarray(out_boxes)[np.asarray(valid)]
    if kept:
        w = b[:, 2] - b[:, 0] + 1
        h = b[:, 3] - b[:, 1] + 1
        assert (w >= 20).all() and (h >= 20).all()
