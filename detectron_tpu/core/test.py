"""Inference engine: detection, mask, and keypoint decoding.

Rebuilds lib/core/test.py (im_detect_all, im_detect_bbox, im_detect_mask,
im_detect_keypoints, box_results_with_nms_and_limit, segm_results,
keypoint_results) the TPU way: the entire bbox pipeline — backbone, RPN,
proposals, box head, score softmax, per-class box decoding, per-class NMS and
the top-DETECTIONS_PER_IM limit — is ONE jit-compiled graph with static
shapes (detect_graph). The reference runs decode + per-class Cython NMS on
the host per image; here per-class NMS is vmapped over (batch, class) on
device.

Host-side paths kept for parity features that are inherently sequential or
rarely used: Soft-NMS, box voting (utils/boxes.py), and TTA (core/test_aug).
Mask pasting into the full image (segm_results) runs on host over the <=100
final detections, as in the reference.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from detectron_tpu.core.config import cfg
from detectron_tpu.models import keypoint_rcnn_heads
from detectron_tpu.models import mask_rcnn_heads
from detectron_tpu.models import model_builder as mb
from detectron_tpu.ops import box_ops
from detectron_tpu.ops import nms as nms_ops
from detectron_tpu.utils import boxes as box_utils


# ---------------------------------------------------------------------------
# In-graph detection
# ---------------------------------------------------------------------------

def _per_class_nms_one_image(boxes_c, scores_c, max_out):
    """vmap-over-classes greedy NMS. boxes_c: (C-1, R, 4); scores_c:
    (C-1, R). Returns (C-1, max_out) indices + validity."""
    def one(b, s):
        # callers feed lax.top_k outputs: already score-descending
        return nms_ops.nms_padded(
            b, s, cfg.TEST.NMS, max_output_size=max_out,
            tile_size=cfg.TPU.NMS_TILE_SIZE, presorted=True)

    return jax.vmap(one)(boxes_c, scores_c)


def detect_graph(params, images, im_info):
    """Full-batch detection. Returns dict:
      boxes  (B, D, 4)  final boxes (scaled-image coords)
      scores (B, D)
      classes (B, D) int32 (1..C-1)
      valid  (B, D) bool
      + (MASK_ON) mask_probs (B, D, M, M)
      + (KEYPOINTS_ON) kps_heatmaps (B, D, S, S, K)
    where D = TEST.DETECTIONS_PER_IM.
    """
    features, scales = mb.forward_features(params, images)
    rpn_outs = mb.forward_rpn(params, features)
    rois, _, roi_valid = mb.generate_proposals(
        rpn_outs, features, im_info, training=False)
    return _detect_tail(params, features, scales, rois, roi_valid, im_info)


def detect_graph_with_proposals(params, images, im_info, proposals,
                                prop_valid):
    """Fast R-CNN mode (cfg.TEST.PRECOMPUTED_PROPOSALS): detection on
    externally supplied proposals (B, R, 4) in scaled-image coords, skipping
    the RPN. The reference's DEDUP_BOXES hashing happens on the host before
    this is called (test_engine)."""
    features, scales = mb.forward_features(params, images)
    return _detect_tail(params, features, scales, proposals, prop_valid,
                        im_info)


def _detect_tail(params, features, scales, rois, roi_valid, im_info):
    """Box head + decode + per-class NMS + top-D limit + mask/kps heads."""
    cls_logits, bbox_pred, _ = mb.forward_box_outputs(
        params, features, scales, rois)

    B, R, C = cls_logits.shape
    probs = jax.nn.softmax(cls_logits.astype(jnp.float32), axis=-1)
    probs = jnp.where(roi_valid[..., None], probs, 0.0)

    if cfg.TEST.BBOX_REG:
        weights = tuple(cfg.MODEL.BBOX_REG_WEIGHTS)
        pred = box_ops.bbox_transform(
            rois, bbox_pred.astype(jnp.float32), weights,
            clip=cfg.BBOX_XFORM_CLIP)  # (B, R, 4C')
        pred = box_ops.clip_tiled_boxes(
            pred, im_info[:, None, 0:1], im_info[:, None, 1:2])
        n_reg = pred.shape[-1] // 4
        pred = pred.reshape(B, R, n_reg, 4)
        if n_reg == C:
            cls_boxes = pred[:, :, 1:, :]  # drop background column
        else:  # class-agnostic: broadcast the fg column to all classes
            cls_boxes = jnp.broadcast_to(pred[:, :, 1:2, :], (B, R, C - 1, 4))
    else:
        cls_boxes = jnp.broadcast_to(rois[:, :, None, :], (B, R, C - 1, 4))

    cls_scores = probs[..., 1:]  # (B, R, C-1)
    thresh_scores = jnp.where(cls_scores > cfg.TEST.SCORE_THRESH,
                              cls_scores, -jnp.inf)

    D = cfg.TEST.DETECTIONS_PER_IM
    boxes_c = jnp.swapaxes(cls_boxes, 1, 2)  # (B, C-1, R, 4)
    scores_c = jnp.swapaxes(thresh_scores, 1, 2)  # (B, C-1, R)

    out_scores, out_boxes, out_classes, out_valid = nms_and_limit_graph(
        boxes_c, scores_c, D)

    out = {
        "boxes": out_boxes,
        "scores": out_scores,
        "classes": jnp.where(out_valid, out_classes, 0),
        "valid": out_valid,
    }

    if cfg.MODEL.MASK_ON:
        out["mask_probs"] = mask_graph(params, features, scales, out_boxes,
                                       out["classes"])
    if cfg.MODEL.KEYPOINTS_ON:
        out["kps_heatmaps"] = keypoint_graph(params, features, scales,
                                             out_boxes)
    return out


def nms_and_limit_graph(boxes_c, scores_c, D):
    """In-graph per-class NMS + cross-class top-D (reference:
    lib/core/test.py :: box_results_with_nms_and_limit, hard-NMS mode).
    boxes_c: (B, C-1, R, 4); scores_c: (B, C-1, R) with -inf below
    SCORE_THRESH. Returns (scores (B, D), boxes (B, D, 4), classes (B, D)
    1-based, valid (B, D))."""
    B, Cm1, R = scores_c.shape

    # Pre-top-k per class before NMS: suppression decisions inside the top
    # K ranks are EXACT regardless of truncation (suppressors are always
    # higher-ranked), so truncation can only LOSE a box at rank > K — which
    # matters only when > K boxes of one class clear SCORE_THRESH and
    # nearly all of the top K get suppressed. That needs > K-D one-class
    # boxes — vanishingly rare at K >= 4D with real score distributions,
    # and when it DOES happen the lax.cond below re-runs the tail
    # untruncated (exact match with the reference's NMS-everything host
    # path at all times; the full branch costs ~(R/K)^2 more IoU work but
    # executes only on overflow batches).
    # Joint stable sort of (score, x1, y1, x2, y2) instead of top_k +
    # take_along_axis: the (B, C-1, R, 4) box gather alone measured
    # 8.4 ms/batch on v5e (xprof fusion.30) vs ~3 ms for the 5-operand
    # sort, and the mask-NMS tail needs no indices back into R. Stable
    # ascending sort on -score == top_k's lowest-index tie order.
    L = B * Cm1
    sorted_ops = jax.lax.sort(
        [-scores_c.reshape(L, R)]
        + [boxes_c.reshape(L, R, 4)[..., j] for j in range(4)],
        dimension=1, num_keys=1, is_stable=True)

    def nms_limit_tail(K):
        top_s = -sorted_ops[0][:, :K].reshape(B, Cm1, K)
        top_b = jnp.stack([o[:, :K] for o in sorted_ops[1:]],
                          axis=-1).reshape(B, Cm1, K, 4)
        # NMS returns a keep MASK in place (no compacted indices): the
        # three take_along_axis gathers the compaction forced downstream
        # measured ~13 ms/batch on v5e — masked scores + one cross-class
        # top-D replace them with elementwise selects. This also drops the
        # per-class D cap the compacted form imposed before the global
        # limit (the reference caps across classes only), so it is the
        # more faithful tail.
        keep = nms_ops.nms_batched_sorted_mask(
            top_b.reshape(B * Cm1, K, 4),
            top_s.reshape(B * Cm1, K),
            cfg.TEST.NMS,
            tile_size=cfg.TPU.NMS_TILE_SIZE).reshape(B, Cm1, K)
        kept_scores = jnp.where(keep, top_s, -jnp.inf)

        # Global top-D across classes (reference: DETECTIONS_PER_IM).
        flat_scores = kept_scores.reshape(B, -1)
        flat_boxes = top_b.reshape(B, -1, 4)
        top_scores, top_idx = jax.lax.top_k(flat_scores, D)
        ob = jnp.take_along_axis(flat_boxes, top_idx[..., None], axis=1)
        oc = (top_idx // K + 1).astype(jnp.int32)
        return top_scores, ob, oc

    K = min(R, max(4 * D, 128))
    if K == R:
        top_scores, out_boxes, out_classes = nms_limit_tail(R)
    else:
        n_above = jnp.sum(jnp.isfinite(scores_c), axis=-1)  # (B, C-1)
        top_scores, out_boxes, out_classes = jax.lax.cond(
            jnp.any(n_above > K),
            lambda: nms_limit_tail(R),
            lambda: nms_limit_tail(K))
    out_valid = jnp.isfinite(top_scores)
    out_scores = jnp.where(out_valid, top_scores, 0.0)
    out_boxes = out_boxes * out_valid[..., None]
    return out_scores, out_boxes, out_classes, out_valid


def detect_raw(params, images, im_info):
    """Pre-NMS detection outputs for the whole batch: softmax scores
    (B, R, C) and decoded per-class boxes (B, R, 4C'), plus the proposal
    validity mask. This is the reference's im_detect_bbox return surface —
    used by TTA (core/test_aug.py) and Soft-NMS/box-voting host paths, which
    need raw distributions rather than hard NMS survivors."""
    features, scales = mb.forward_features(params, images)
    rpn_outs = mb.forward_rpn(params, features)
    rois, _, roi_valid = mb.generate_proposals(
        rpn_outs, features, im_info, training=False)
    cls_logits, bbox_pred, _ = mb.forward_box_outputs(
        params, features, scales, rois)
    B, R, C = cls_logits.shape
    probs = jax.nn.softmax(cls_logits.astype(jnp.float32), axis=-1)
    probs = jnp.where(roi_valid[..., None], probs, 0.0)
    if cfg.TEST.BBOX_REG:
        pred = box_ops.bbox_transform(
            rois, bbox_pred.astype(jnp.float32),
            tuple(cfg.MODEL.BBOX_REG_WEIGHTS), clip=cfg.BBOX_XFORM_CLIP)
        pred = box_ops.clip_tiled_boxes(
            pred, im_info[:, None, 0:1], im_info[:, None, 1:2])
    else:
        n_reg = bbox_pred.shape[-1] // 4
        pred = jnp.tile(rois, (1, 1, n_reg))
    return {"scores": probs, "boxes": pred, "valid": roi_valid, "rois": rois}


def mask_graph(params, features, scales, det_boxes, det_classes):
    """Mask head on the final detections (reference: im_detect_mask).
    det_boxes: (B, D, 4) scaled coords. Returns (B, D, M, M) sigmoid probs
    for each detection's class channel."""
    B, D = det_boxes.shape[:2]
    roi_feat = mb.roi_feature_transform(
        params, features, scales, det_boxes,
        cfg.MRCNN.ROI_XFORM_RESOLUTION, cfg.MRCNN.ROI_XFORM_SAMPLING_RATIO,
        method=cfg.MRCNN.ROI_XFORM_METHOD)
    flat = roi_feat.reshape((B * D,) + roi_feat.shape[2:])
    h = mask_rcnn_heads.apply_mask_head(
        params["mask_head"], flat,
        shared_res5_params=params.get("box_head", {}).get("res5"))
    logits = mask_rcnn_heads.apply_mask_outputs(params["mask_outs"], h)
    M = logits.shape[1]
    # Select the detection's class channel BEFORE un-flattening: the class
    # gather shrinks the tensor 81x, so the (B, D, M, M, C) relayout the
    # old order forced (xprof: 2.7 ms/step at batch 32) collapses to a
    # (B*D, M, M) reshape.
    if logits.shape[-1] > 1:
        cls_flat = det_classes.reshape(B * D).astype(jnp.int32)
        sel = jnp.take_along_axis(
            logits, cls_flat[:, None, None, None], axis=3)[..., 0]
    else:
        sel = logits[..., 0]
    return jax.nn.sigmoid(sel.reshape(B, D, M, M).astype(jnp.float32))


def keypoint_graph(params, features, scales, det_boxes):
    """Keypoint head on the final detections (reference:
    im_detect_keypoints). Returns raw heatmaps (B, D, S, S, K)."""
    B, D = det_boxes.shape[:2]
    roi_feat = mb.roi_feature_transform(
        params, features, scales, det_boxes,
        cfg.KRCNN.ROI_XFORM_RESOLUTION, cfg.KRCNN.ROI_XFORM_SAMPLING_RATIO,
        method=cfg.KRCNN.ROI_XFORM_METHOD)
    flat = roi_feat.reshape((B * D,) + roi_feat.shape[2:])
    h = keypoint_rcnn_heads.apply_pose_head(params["kps_head"], flat)
    hm = keypoint_rcnn_heads.apply_keypoint_outputs(params["kps_outs"], h)
    return hm.reshape((B, D) + hm.shape[1:]).astype(jnp.float32)


def mask_on_boxes_graph(params, images, im_info, det_boxes):
    """Recompute features and run the mask head on given (scaled) boxes —
    the TTA / host-NMS path's equivalent of im_detect_mask."""
    features, scales = mb.forward_features(params, images)
    # class-agnostic channel selection happens on host for this path; return
    # all-class probs by passing class 0..C-1 later. Simplest: return probs
    # for every class channel.
    B, D = det_boxes.shape[:2]
    roi_feat = mb.roi_feature_transform(
        params, features, scales, det_boxes,
        cfg.MRCNN.ROI_XFORM_RESOLUTION, cfg.MRCNN.ROI_XFORM_SAMPLING_RATIO,
        method=cfg.MRCNN.ROI_XFORM_METHOD)
    flat = roi_feat.reshape((B * D,) + roi_feat.shape[2:])
    h = mask_rcnn_heads.apply_mask_head(
        params["mask_head"], flat,
        shared_res5_params=params.get("box_head", {}).get("res5"))
    logits = mask_rcnn_heads.apply_mask_outputs(params["mask_outs"], h)
    M = logits.shape[1]
    return jax.nn.sigmoid(
        logits.reshape(B, D, M, M, -1).astype(jnp.float32))


def kps_on_boxes_graph(params, images, im_info, det_boxes):
    """Recompute features and run the keypoint head on given boxes."""
    features, scales = mb.forward_features(params, images)
    return keypoint_graph(params, features, scales, det_boxes)


def im_detect_all(params, im, fns, timers=None):
    """Per-image orchestration with the reference's feature flags
    (lib/core/test.py :: im_detect_all): TTA (TEST.BBOX_AUG/MASK_AUG/
    KPS_AUG), Soft-NMS, box voting. `fns` is a dict of jitted graphs:
    detect_raw, mask_on_boxes, kps_on_boxes.

    Returns (cls_boxes, cls_segms, cls_keyps) in the reference's per-class
    list format (boxes in original image coordinates).
    """
    import jax.numpy as jnp_  # noqa: F401

    from detectron_tpu.core import test_aug
    from detectron_tpu.core import test_engine

    if cfg.TEST.BBOX_AUG.ENABLED:
        scores, boxes = test_aug.im_detect_bbox_aug(
            fns["detect_raw"], params, im)
    else:
        blob, scale, im_info = test_aug._prep(
            im, cfg.TEST.SCALE, cfg.TEST.MAX_SIZE)
        out = fns["detect_raw"](params, jnp.asarray(blob),
                                jnp.asarray(im_info))
        scores = np.asarray(out["scores"][0])
        boxes = np.asarray(out["boxes"][0]) / scale

    scores_f, boxes_f, cls_boxes = box_results_with_nms_and_limit(
        scores, boxes)

    cls_segms = None
    cls_keyps = None
    num_classes = cfg.MODEL.NUM_CLASSES
    # Flatten per-class results to run heads once over all detections.
    det_boxes = np.vstack(
        [cls_boxes[j][:, :4] for j in range(1, num_classes)
         if len(cls_boxes[j])] or [np.zeros((0, 4), np.float32)])
    det_classes = np.concatenate(
        [np.full(len(cls_boxes[j]), j, np.int32)
         for j in range(1, num_classes) if len(cls_boxes[j])] or
        [np.zeros((0,), np.int32)])

    if cfg.MODEL.MASK_ON and det_boxes.shape[0] > 0:
        D_fix = cfg.TEST.DETECTIONS_PER_IM
        padded = np.zeros((D_fix, 4), np.float32)
        n = min(len(det_boxes), D_fix)
        padded[:n] = det_boxes[:n]
        if cfg.TEST.MASK_AUG.ENABLED:
            def mask_fn(p, b, ii, bx):
                pc = np.asarray(fns["mask_on_boxes"](p, b, ii, bx))
                return _sel_probs(pc[0], det_classes, n)[None]

            probs_all = test_aug.im_detect_mask_aug(mask_fn, params, im,
                                                    padded)
        else:
            blob, scale, im_info = test_aug._prep(
                im, cfg.TEST.SCALE, cfg.TEST.MAX_SIZE)
            probs_c = fns["mask_on_boxes"](
                params, jnp.asarray(blob), jnp.asarray(im_info),
                jnp.asarray((padded * scale)[None]))
            probs_all = _sel_probs(np.asarray(probs_c)[0], det_classes, n)
        rles = test_engine.segm_results(
            det_boxes[:n], det_classes[:n], probs_all[:n],
            im.shape[0], im.shape[1])
        cls_segms = [[] for _ in range(num_classes)]
        for r, j in zip(rles, det_classes[:n]):
            cls_segms[j].append(r)

    if cfg.MODEL.KEYPOINTS_ON and det_boxes.shape[0] > 0:
        D_fix = cfg.TEST.DETECTIONS_PER_IM
        padded = np.zeros((D_fix, 4), np.float32)
        n = min(len(det_boxes), D_fix)
        padded[:n] = det_boxes[:n]
        if cfg.TEST.KPS_AUG.ENABLED:
            hm = test_aug.im_detect_kps_aug(fns["kps_on_boxes"], params, im,
                                            padded)
        else:
            blob, scale, im_info = test_aug._prep(
                im, cfg.TEST.SCALE, cfg.TEST.MAX_SIZE)
            hm = np.asarray(fns["kps_on_boxes"](
                params, jnp.asarray(blob), jnp.asarray(im_info),
                jnp.asarray((padded * scale)[None]))[0])
        xy = test_engine.keypoint_results(det_boxes[:n], hm[:n])
        cls_keyps = [[] for _ in range(num_classes)]
        for k_i, j in enumerate(det_classes[:n]):
            cls_keyps[j].append(xy[k_i])

    return cls_boxes, cls_segms, cls_keyps


def _sel_probs(probs_all_classes, det_classes, n):
    """(D, M, M, C') -> (D, M, M) selecting each detection's class channel."""
    if isinstance(probs_all_classes, jnp.ndarray):
        probs_all_classes = np.asarray(probs_all_classes)
    if probs_all_classes.ndim == 4 and probs_all_classes.shape[-1] == 1:
        return probs_all_classes[..., 0]
    out = np.zeros(probs_all_classes.shape[:3], np.float32)
    for i in range(min(n, len(det_classes))):
        out[i] = probs_all_classes[i, :, :, det_classes[i]]
    return out


# ---------------------------------------------------------------------------
# Host-side result assembly (per image)
# ---------------------------------------------------------------------------

def box_results_with_nms_and_limit(scores, boxes):
    """Host reference path for Soft-NMS / box-voting modes (reference:
    lib/core/test.py :: box_results_with_nms_and_limit). scores: (R, C)
    softmax; boxes: (R, 4C) decoded. Returns (scores, boxes, cls_boxes list
    per class)."""
    num_classes = cfg.MODEL.NUM_CLASSES
    cls_boxes = [[] for _ in range(num_classes)]
    for j in range(1, num_classes):
        inds = np.where(scores[:, j] > cfg.TEST.SCORE_THRESH)[0]
        scores_j = scores[inds, j]
        if boxes.shape[1] > 8:
            boxes_j = boxes[inds, j * 4:(j + 1) * 4]
        else:
            boxes_j = boxes[inds, 4:8]
        dets_j = np.hstack((boxes_j, scores_j[:, np.newaxis])).astype(
            np.float32, copy=False)
        if cfg.TEST.SOFT_NMS.ENABLED:
            nms_dets, _ = box_utils.soft_nms(
                dets_j,
                sigma=cfg.TEST.SOFT_NMS.SIGMA,
                overlap_thresh=cfg.TEST.NMS,
                score_thresh=0.0001,
                method=cfg.TEST.SOFT_NMS.METHOD,
            )
        else:
            keep = box_utils.nms(dets_j, cfg.TEST.NMS)
            nms_dets = dets_j[keep, :]
        if cfg.TEST.BBOX_VOTE.ENABLED:
            nms_dets = box_utils.box_voting(
                nms_dets, dets_j, cfg.TEST.BBOX_VOTE.VOTE_TH,
                scoring_method=cfg.TEST.BBOX_VOTE.SCORING_METHOD,
                beta=cfg.TEST.BBOX_VOTE.SCORING_METHOD_BETA,
            )
        cls_boxes[j] = nms_dets

    # Limit to DETECTIONS_PER_IM over all classes
    if cfg.TEST.DETECTIONS_PER_IM > 0:
        image_scores = np.hstack(
            [cls_boxes[j][:, -1] for j in range(1, num_classes)
             if len(cls_boxes[j])] or [np.array([])])
        if len(image_scores) > cfg.TEST.DETECTIONS_PER_IM:
            image_thresh = np.sort(image_scores)[
                -cfg.TEST.DETECTIONS_PER_IM]
            for j in range(1, num_classes):
                if len(cls_boxes[j]) == 0:
                    continue
                keep = np.where(cls_boxes[j][:, -1] >= image_thresh)[0]
                cls_boxes[j] = cls_boxes[j][keep, :]

    im_results = np.vstack(
        [cls_boxes[j] for j in range(1, num_classes) if len(cls_boxes[j])]
        or [np.zeros((0, 5), np.float32)])
    boxes_out = im_results[:, :-1]
    scores_out = im_results[:, -1]
    return scores_out, boxes_out, cls_boxes
