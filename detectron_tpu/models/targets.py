"""In-graph training-target assignment (RPN anchors, RoI sampling, mask and
keypoint targets).

This replaces the reference's host-side numpy layer — lib/roi_data/rpn.py ::
_get_rpn_blobs, lib/roi_data/fast_rcnn.py :: add_fast_rcnn_blobs /
_sample_rois, lib/roi_data/mask_rcnn.py :: add_mask_rcnn_blobs,
lib/roi_data/keypoint_rcnn.py :: add_keypoint_rcnn_blobs, and the
mid-forward host callback lib/modeling/generate_proposal_labels.py ::
GenerateProposalLabelsOp — with pure-jnp functions that run INSIDE the jitted
train step. This removes the per-step device->host->device round trip that
dominates the reference's training step (SURVEY.md §1 structural fact #2).

Static-shape conventions:
- gt boxes padded to (G, 4) with gt_valid mask; crowd boxes separate.
- sampled outputs are fixed-size with validity masks; losses normalize by
  valid counts, reproducing the reference's dynamic-size numerics.
- random sampling without replacement uses the exp-race trick: draw iid
  uniforms, take top-k among candidates (equivalent to a uniform random
  subset).
- the sampled RoI list is ordered fg-first, so the mask/keypoint branches
  can statically slice the first MAX_FG rows (Detectron's mask_rois are
  exactly the fg rois).
"""

import jax
import jax.numpy as jnp

from detectron_tpu.core.config import cfg
from detectron_tpu.ops import box_ops


def _rank(x):
    """Dense rank (0 = largest) of entries of x along the last axis."""
    order = jnp.argsort(-x)
    ranks = jnp.zeros_like(order)
    ranks = ranks.at[order].set(jnp.arange(x.shape[-1]))
    return ranks


def _iof(boxes, crowd):
    """Intersection-over-foreground-area of `boxes` against crowd regions.
    (N, 4), (K, 4) -> (N, K)."""
    area_b = box_ops.boxes_area(boxes)
    ix1 = jnp.maximum(boxes[:, None, 0], crowd[None, :, 0])
    iy1 = jnp.maximum(boxes[:, None, 1], crowd[None, :, 1])
    ix2 = jnp.minimum(boxes[:, None, 2], crowd[None, :, 2])
    iy2 = jnp.minimum(boxes[:, None, 3], crowd[None, :, 3])
    iw = jnp.maximum(ix2 - ix1 + 1.0, 0.0)
    ih = jnp.maximum(iy2 - iy1 + 1.0, 0.0)
    return (iw * ih) / jnp.maximum(area_b[:, None], 1.0)


# ---------------------------------------------------------------------------
# RPN anchor targets
# ---------------------------------------------------------------------------

def rpn_targets_one_image(anchors, gt_boxes, gt_valid, im_hw, rng):
    """Anchor classification labels + regression targets for one image.

    anchors: (A, 4) static anchor field (all levels concatenated for FPN);
    gt_boxes: (G, 4); gt_valid: (G,) bool (non-crowd gt); im_hw: (2,) scaled
    image size inside the padded canvas; rng: PRNGKey.

    Returns dict(labels (A,) in {1,0,-1}, bbox_targets (A,4), fg (A,) bool).
    Semantics match lib/roi_data/rpn.py :: _get_rpn_blobs with
    RPN_STRADDLE_THRESH applied against the scaled image bounds.
    """
    A = anchors.shape[0]
    straddle = cfg.TRAIN.RPN_STRADDLE_THRESH
    if straddle >= 0:
        inside = (
            (anchors[:, 0] >= -straddle)
            & (anchors[:, 1] >= -straddle)
            & (anchors[:, 2] < im_hw[1] + straddle)
            & (anchors[:, 3] < im_hw[0] + straddle)
        )
    else:
        inside = jnp.ones((A,), bool)

    iou = box_ops.bbox_overlaps(anchors, gt_boxes)  # (A, G)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    anchor_max = jnp.max(iou, axis=1)
    anchor_argmax = jnp.argmax(iou, axis=1)

    # Per-gt best anchors (including ties): anchors achieving the per-gt max.
    gt_max = jnp.max(jnp.where(inside[:, None], iou, -1.0), axis=0)  # (G,)
    is_gt_best = jnp.any(
        (iou == gt_max[None, :]) & (gt_max[None, :] > 0) & gt_valid[None, :],
        axis=1)

    pos = inside & (is_gt_best | (anchor_max >= cfg.TRAIN.RPN_POSITIVE_OVERLAP))
    neg = inside & (anchor_max < cfg.TRAIN.RPN_NEGATIVE_OVERLAP) & ~pos

    # Subsample: at most num_fg positives, then num_bg = batch - n_fg negs.
    batch = cfg.TRAIN.RPN_BATCH_SIZE_PER_IM
    num_fg_cap = int(cfg.TRAIN.RPN_FG_FRACTION * batch)
    k1, k2 = jax.random.split(rng)
    r_fg = jnp.where(pos, jax.random.uniform(k1, (A,)), -1.0)
    fg_rank = _rank(r_fg)
    fg_sel = pos & (fg_rank < num_fg_cap)
    n_fg = jnp.sum(fg_sel)

    r_bg = jnp.where(neg, jax.random.uniform(k2, (A,)), -1.0)
    bg_rank = _rank(r_bg)
    bg_sel = neg & (bg_rank < (batch - n_fg))

    labels = jnp.where(fg_sel, 1, jnp.where(bg_sel, 0, -1))

    matched_gt = gt_boxes[anchor_argmax]
    bbox_targets = box_ops.bbox_transform_inv(anchors, matched_gt,
                                              (1.0, 1.0, 1.0, 1.0))
    bbox_targets = jnp.where(fg_sel[:, None], bbox_targets, 0.0)
    return {"labels": labels, "bbox_targets": bbox_targets, "fg": fg_sel}


# ---------------------------------------------------------------------------
# Fast R-CNN RoI sampling
# ---------------------------------------------------------------------------

def sample_rois_one_image(proposals, prop_valid, gt_boxes, gt_classes,
                          gt_valid, crowd_boxes, crowd_valid, rng):
    """Sample BATCH_SIZE_PER_IM RoIs with FG_FRACTION foreground, fg-first.

    proposals: (P, 4) RPN proposals for this image (gt boxes are appended
    here, reproducing json_dataset.add_proposals); prop_valid: (P,);
    gt_boxes/classes/valid: (G, ...); crowd_boxes/valid: (K, 4)/(K,).

    Returns dict with fixed shapes (S = TRAIN.BATCH_SIZE_PER_IM):
      rois (S, 4), labels (S,), valid (S,), fg (S,),
      bbox_targets (S, 4) (encoded, / BBOX_REG_WEIGHTS),
      gt_idx (S,) matched gt index (for mask/kps target lookup).
    """
    all_boxes = jnp.concatenate([proposals, gt_boxes], axis=0)
    all_valid = jnp.concatenate([prop_valid, gt_valid], axis=0)
    N = all_boxes.shape[0]

    iou = box_ops.bbox_overlaps(all_boxes, gt_boxes)
    iou = jnp.where(gt_valid[None, :] & all_valid[:, None], iou, -1.0)
    max_ov = jnp.max(iou, axis=1)
    gt_idx = jnp.argmax(iou, axis=1)

    # Crowd filtering: proposals mostly inside crowd regions are excluded
    # entirely (reference: json_dataset._filter_crowd_proposals semantics via
    # TRAIN.CROWD_FILTER_THRESH).
    if crowd_boxes.shape[0] > 0:
        iof = _iof(all_boxes, crowd_boxes)
        iof = jnp.where(crowd_valid[None, :], iof, 0.0)
        in_crowd = jnp.max(iof, axis=1) > cfg.TRAIN.CROWD_FILTER_THRESH
        max_ov = jnp.where(in_crowd, -1.0, max_ov)

    fg_cand = all_valid & (max_ov >= cfg.TRAIN.FG_THRESH)
    bg_cand = all_valid & (max_ov < cfg.TRAIN.BG_THRESH_HI) & \
        (max_ov >= cfg.TRAIN.BG_THRESH_LO)

    S = cfg.TRAIN.BATCH_SIZE_PER_IM
    fg_cap = int(round(cfg.TRAIN.FG_FRACTION * S))
    k1, k2 = jax.random.split(rng)
    r_fg = jnp.where(fg_cand, jax.random.uniform(k1, (N,)), -1.0)
    fg_sel = fg_cand & (_rank(r_fg) < fg_cap)
    n_fg = jnp.sum(fg_sel)

    r_bg = jnp.where(bg_cand, jax.random.uniform(k2, (N,)), -1.0)
    bg_sel = bg_cand & (_rank(r_bg) < (S - n_fg))

    # Order: fg first (by random key), then bg, then everything else.
    sort_key = jnp.where(fg_sel, 0.0, jnp.where(bg_sel, 1.0, 2.0)) * 10.0 \
        - jnp.where(fg_sel, r_fg, jnp.where(bg_sel, r_bg, 0.0))
    order = jnp.argsort(sort_key)[:S]

    rois = all_boxes[order]
    sel_fg = fg_sel[order]
    sel_bg = bg_sel[order]
    valid = sel_fg | sel_bg
    matched = gt_idx[order]
    labels = jnp.where(sel_fg, gt_classes[matched], 0)
    labels = jnp.where(valid, labels, 0).astype(jnp.int32)

    targets = box_ops.bbox_transform_inv(
        rois, gt_boxes[matched], tuple(cfg.MODEL.BBOX_REG_WEIGHTS))
    targets = jnp.where(sel_fg[:, None], targets, 0.0)

    return {
        "rois": rois,
        "labels": labels,
        "valid": valid,
        "fg": sel_fg,
        "bbox_targets": targets,
        "gt_idx": matched.astype(jnp.int32),
    }


# ---------------------------------------------------------------------------
# Mask targets
# ---------------------------------------------------------------------------

def mask_targets_one_image(rois, fg, gt_idx, gt_boxes, gt_masks, resolution):
    """Binary mask targets for the first MAX_FG sampled RoIs.

    rois: (F, 4) the fg-first slice of sampled rois; fg: (F,) validity;
    gt_idx: (F,) matched gt; gt_boxes: (G, 4); gt_masks: (G, Mh, Mw) dense
    instance masks rasterized over each gt box by the host loader (the
    reference rasterizes polygons per sampled RoI on the host each step —
    lib/roi_data/mask_rcnn.py :: add_mask_rcnn_blobs via
    segm_utils.polys_to_mask_wrt_box; here the loader rasterizes once per gt
    at fixed resolution and the jitted step crop-resizes, the standard TPU
    formulation).

    Returns (targets (F, res, res) in {0,1}, weights = fg).
    """
    G, Mh, Mw = gt_masks.shape
    gb = gt_boxes[gt_idx]  # (F, 4)
    gw = jnp.maximum(gb[:, 2] - gb[:, 0], 1e-3)
    gh = jnp.maximum(gb[:, 3] - gb[:, 1], 1e-3)

    # RoI pixel-center grid in image coords (matches polys_to_mask_wrt_box's
    # cell convention: res cells spanning the box).
    p = (jnp.arange(resolution) + 0.5) / resolution
    ys = rois[:, 1, None] + p[None, :] * (rois[:, 3] - rois[:, 1])[:, None]
    xs = rois[:, 0, None] + p[None, :] * (rois[:, 2] - rois[:, 0])[:, None]

    # Map into gt-mask cell coordinates.
    my = (ys - gb[:, 1, None]) / gh[:, None] * Mh - 0.5  # (F, res)
    mx = (xs - gb[:, 0, None]) / gw[:, None] * Mw - 0.5

    masks = gt_masks[gt_idx].astype(jnp.float32)  # (F, Mh, Mw)

    def bilin_axis(coords, size):
        c = jnp.clip(coords, 0.0, size - 1.0)
        idx = jnp.arange(size, dtype=jnp.float32)
        w = jnp.maximum(0.0, 1.0 - jnp.abs(c[..., None] - idx))  # (F,res,size)
        inb = (coords >= -1.0) & (coords <= size)
        return w * inb[..., None]

    wy = bilin_axis(my, Mh)  # (F, res, Mh)
    wx = bilin_axis(mx, Mw)  # (F, res, Mw)
    sampled = jnp.einsum("fph,fhw,fqw->fpq", wy, masks, wx,
                         precision=jax.lax.Precision.HIGHEST)
    targets = (sampled >= 0.5).astype(jnp.float32)
    return targets, fg


# ---------------------------------------------------------------------------
# Keypoint targets
# ---------------------------------------------------------------------------

def keypoint_targets_one_image(rois, fg, gt_idx, gt_keypoints):
    """Heatmap bin targets for the fg RoI slice.

    gt_keypoints: (G, K, 3) [x, y, vis]. Returns (bins (F, K) int32 in
    [0, S^2), weights (F, K)). Matches lib/utils/keypoints.py ::
    keypoints_to_heatmap_labels discretization.
    """
    S = cfg.KRCNN.HEATMAP_SIZE
    kps = gt_keypoints[gt_idx]  # (F, K, 3)
    x, y, vis = kps[..., 0], kps[..., 1], kps[..., 2]

    x1, y1, x2, y2 = rois[:, 0], rois[:, 1], rois[:, 2], rois[:, 3]
    scale_x = S / jnp.maximum(x2 - x1, 1e-3)
    scale_y = S / jnp.maximum(y2 - y1, 1e-3)

    # Detectron: offset then floor, with the exact-right-edge mapped inside.
    bx = jnp.floor((x - x1[:, None]) * scale_x[:, None])
    by = jnp.floor((y - y1[:, None]) * scale_y[:, None])
    bx = jnp.where(x == x2[:, None], S - 1, bx)
    by = jnp.where(y == y2[:, None], S - 1, by)

    inside = (bx >= 0) & (bx < S) & (by >= 0) & (by < S)
    valid = inside & (vis > 0) & fg[:, None]
    bins = (by * S + bx).astype(jnp.int32)
    bins = jnp.clip(bins, 0, S * S - 1)
    return jnp.where(valid, bins, 0), valid.astype(jnp.float32)
