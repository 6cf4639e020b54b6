"""The complete training forward: features -> RPN -> in-graph proposals ->
in-graph RoI sampling -> heads -> losses. Everything here runs inside ONE
jit-compiled step; there is no host round trip (contrast with the reference's
Generalized_RCNN.forward, which calls numpy target assignment mid-forward —
lib/modeling/generate_proposal_labels.py).

Batch element layout (all padded static shapes, produced by the data loader):
  images      (B, H, W, 3)  float32/bfloat16, BGR, mean-subtracted, 0-padded
  im_info     (B, 3)        [scaled_h, scaled_w, scale]
  gt_boxes    (B, G, 4)     scaled coords, non-crowd
  gt_classes  (B, G)        int32 contiguous category ids (1..C-1)
  gt_valid    (B, G)        bool
  crowd_boxes (B, Kc, 4), crowd_valid (B, Kc)
  gt_masks    (B, G, Mh, Mw) float/bool (only when MASK_ON)
  gt_keypoints (B, G, K, 3) (only when KEYPOINTS_ON)
"""

import jax
import jax.numpy as jnp

from detectron_tpu.core.config import cfg
from detectron_tpu.models import fpn as fpn_mod
from detectron_tpu.models import keypoint_rcnn_heads
from detectron_tpu.models import losses as L
from detectron_tpu.models import mask_rcnn_heads
from detectron_tpu.models import model_builder as mb
from detectron_tpu.models import rpn as rpn_mod
from detectron_tpu.models import targets as T


def _all_anchors(rpn_outs):
    """Concatenate the static anchor fields of every RPN level -> (A_tot, 4),
    plus flattened logits/deltas aligned with it."""
    is_fpn_rpn = cfg.FPN.FPN_ON and cfg.FPN.MULTILEVEL_RPN
    anchors = []
    logits = []
    deltas = []
    if is_fpn_rpn:
        acfg = rpn_mod.fpn_anchor_config()
    for li, (cls_logits, bbox_pred) in enumerate(rpn_outs):
        B, H, W, A = cls_logits.shape
        if is_fpn_rpn:
            _, stride, size = acfg[li]
            sizes, ratios = (size,), cfg.FPN.RPN_ASPECT_RATIOS
        else:
            stride, sizes, ratios = cfg.RPN.STRIDE, cfg.RPN.SIZES, \
                cfg.RPN.ASPECT_RATIOS
        anchors.append(rpn_mod.level_anchors(stride, sizes, ratios, H, W))
        logits.append(cls_logits.reshape(B, H * W * A))
        deltas.append(bbox_pred.reshape(B, H * W * A, 4))
    return (jnp.concatenate(anchors, axis=0),
            jnp.concatenate(logits, axis=1),
            jnp.concatenate(deltas, axis=1))


def training_losses(params, batch, rng):
    """Returns (total_loss, dict of losses/metrics). Pure; jit/pjit-able."""
    images = batch["images"]
    im_info = batch["im_info"]
    B = images.shape[0]

    features, scales = mb.forward_features(params, images)
    rngs = jax.random.split(rng, B + 2)

    out_rpn = {}
    if cfg.RPN.RPN_ON:
        rpn_outs = mb.forward_rpn(params, features)

        # ---------------- RPN losses ----------------
        anchors, rpn_logits, rpn_deltas = _all_anchors(rpn_outs)
        anchor_rngs = rngs[:B]
        tgt = jax.vmap(
            lambda gt, gv, info, r: T.rpn_targets_one_image(
                anchors, gt, gv, info[:2], r)
        )(batch["gt_boxes"], batch["gt_valid"], im_info, anchor_rngs)

        loss_rpn_cls, loss_rpn_bbox = L.rpn_losses(
            rpn_logits.reshape(-1),
            rpn_deltas.reshape(-1, 4),
            tgt["labels"].reshape(-1),
            tgt["bbox_targets"].reshape(-1, 4),
            tgt["fg"].reshape(-1),
        )
        out_rpn = {"loss_rpn_cls": loss_rpn_cls,
                   "loss_rpn_bbox": loss_rpn_bbox}

        # ---------------- Proposals + RoI sampling ----------------
        rois, _, prop_valid = mb.generate_proposals(
            rpn_outs, features, im_info, training=True)
        # Do not backprop into the RPN through the proposal boxes (the
        # reference's proposals are host numpy, hence implicitly detached).
        rois = jax.lax.stop_gradient(rois)
    else:
        # Fast R-CNN mode: precomputed proposals from TRAIN.PROPOSAL_FILES
        # (reference: lib/roi_data/minibatch.py non-RPN branch; no RPN
        # losses).
        rois = batch["proposals"]
        prop_valid = batch["prop_valid"]

    roi_rngs = jax.random.split(rngs[B], B)
    sampled = jax.vmap(T.sample_rois_one_image)(
        rois, prop_valid, batch["gt_boxes"], batch["gt_classes"],
        batch["gt_valid"], batch["crowd_boxes"], batch["crowd_valid"],
        roi_rngs)

    # ---------------- Box head ----------------
    cls_logits, bbox_pred, _ = mb.forward_box_outputs(
        params, features, scales, sampled["rois"])
    S = sampled["rois"].shape[1]
    loss_cls, loss_bbox, acc = L.fast_rcnn_losses(
        cls_logits.reshape(B * S, -1),
        bbox_pred.reshape(B * S, -1),
        sampled["labels"].reshape(-1),
        sampled["valid"].reshape(-1),
        sampled["bbox_targets"].reshape(-1, 4),
        sampled["fg"].reshape(-1),
    )

    out = dict(out_rpn)
    out.update({
        "loss_cls": loss_cls,
        "loss_bbox": loss_bbox,
        "accuracy_cls": acc,
    })

    # ---------------- Mask branch ----------------
    fg_cap = int(round(cfg.TRAIN.FG_FRACTION * cfg.TRAIN.BATCH_SIZE_PER_IM))
    if cfg.MODEL.MASK_ON:
        mask_rois = sampled["rois"][:, :fg_cap]
        mask_fg = sampled["fg"][:, :fg_cap]
        mask_gt_idx = sampled["gt_idx"][:, :fg_cap]
        roi_feat = mb.roi_feature_transform(
            params, features, scales, mask_rois,
            cfg.MRCNN.ROI_XFORM_RESOLUTION, cfg.MRCNN.ROI_XFORM_SAMPLING_RATIO,
            method=cfg.MRCNN.ROI_XFORM_METHOD)
        flat = roi_feat.reshape((B * fg_cap,) + roi_feat.shape[2:])
        mh = mask_rcnn_heads.apply_mask_head(
            params["mask_head"], flat,
            shared_res5_params=params.get("box_head", {}).get("res5"))
        mlogits = mask_rcnn_heads.apply_mask_outputs(params["mask_outs"], mh)
        res = cfg.MRCNN.RESOLUTION
        mtgt, mw = jax.vmap(
            lambda r, f, gi, gb, gm: T.mask_targets_one_image(
                r, f, gi, gb, gm, res)
        )(mask_rois, mask_fg, mask_gt_idx, batch["gt_boxes"],
          batch["gt_masks"])
        out["loss_mask"] = L.mask_rcnn_losses(
            mlogits.reshape(B * fg_cap, res, res, -1),
            mtgt.reshape(B * fg_cap, res, res),
            sampled["labels"][:, :fg_cap].reshape(-1),
            mw.reshape(-1))

    # ---------------- Keypoint branch ----------------
    if cfg.MODEL.KEYPOINTS_ON:
        kps_rois = sampled["rois"][:, :fg_cap]
        kps_fg = sampled["fg"][:, :fg_cap]
        kps_gt_idx = sampled["gt_idx"][:, :fg_cap]
        roi_feat = mb.roi_feature_transform(
            params, features, scales, kps_rois,
            cfg.KRCNN.ROI_XFORM_RESOLUTION, cfg.KRCNN.ROI_XFORM_SAMPLING_RATIO,
            method=cfg.KRCNN.ROI_XFORM_METHOD)
        flat = roi_feat.reshape((B * fg_cap,) + roi_feat.shape[2:])
        kh = keypoint_rcnn_heads.apply_pose_head(params["kps_head"], flat)
        klogits = keypoint_rcnn_heads.apply_keypoint_outputs(
            params["kps_outs"], kh)
        kbins, kweights = jax.vmap(T.keypoint_targets_one_image)(
            kps_rois, kps_fg, kps_gt_idx, batch["gt_keypoints"])
        K = kbins.shape[-1]
        out["loss_kps"] = L.keypoint_losses(
            klogits,
            kbins.reshape(B * fg_cap, K),
            kweights.reshape(B * fg_cap, K))

    total = sum(v for k, v in out.items() if k.startswith("loss_"))
    return total, out
