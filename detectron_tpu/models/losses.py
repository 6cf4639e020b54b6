"""Loss functions, exact Detectron semantics.

Rebuilds lib/utils/net.py :: smooth_l1_loss and the per-head loss functions
(lib/modeling/rpn_heads.py :: single_scale_rpn_losses, FPN.fpn_rpn_losses,
fast_rcnn_heads.fast_rcnn_losses, mask_rcnn_heads.mask_rcnn_losses,
keypoint_rcnn_heads.keypoint_losses).

All losses take fixed-shape tensors with validity masks (the static-shape
twin of the reference's dynamically-sized sampled blobs): a masked element
contributes 0 to the sum and 0 to the normalizer, which reproduces the
reference's dynamic-shape numerics exactly.
"""

import jax
import jax.numpy as jnp

from detectron_tpu.core.config import cfg


def smooth_l1(x, beta):
    """Huber-style smooth L1: 0.5 x^2 / beta for |x| < beta else |x|-0.5 beta."""
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * x * x / beta, ax - 0.5 * beta)


def smooth_l1_loss(pred, targets, inside_weights, outside_weights, beta=1.0):
    """sum(outside * smooth_l1(inside * (pred - target))) — the reference's
    lib/utils/net.py :: smooth_l1_loss (already summed; caller normalizes)."""
    diff = inside_weights * (pred - targets)
    return jnp.sum(outside_weights * smooth_l1(diff, beta))


def sigmoid_ce(logits, labels):
    """Elementwise sigmoid cross-entropy with logits (stable)."""
    return jnp.maximum(logits, 0) - logits * labels + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))


def rpn_losses(cls_logits, bbox_pred, labels, bbox_targets, bbox_valid):
    """RPN losses over the sampled anchor set of the whole batch.

    cls_logits, labels: (N,) where labels in {1, 0, -1(ignore)};
    bbox_pred/bbox_targets: (N, 4); bbox_valid: (N,) — 1 for fg anchors.

    cls: BCE summed over sampled (label>=0) anchors, / (RPN_BATCH_SIZE_PER_IM
    * num_images). bbox: smooth_l1(beta=1/9) summed over fg anchors with the
    same normalizer (Detectron fg inside weights=1, outside=1/Nsample).
    """
    num_images = cfg.TRAIN.IMS_PER_BATCH
    normalizer = cfg.TRAIN.RPN_BATCH_SIZE_PER_IM * num_images

    w = (labels >= 0).astype(jnp.float32)
    cls_loss = jnp.sum(w * sigmoid_ce(cls_logits.astype(jnp.float32),
                                      jnp.maximum(labels, 0).astype(
                                          jnp.float32))) / normalizer

    fg = bbox_valid.astype(jnp.float32)[:, None]
    bbox_loss = smooth_l1_loss(
        bbox_pred.astype(jnp.float32), bbox_targets, fg,
        jnp.full_like(fg, 1.0 / normalizer) * fg, beta=1.0 / 9.0)
    return cls_loss, bbox_loss


def fast_rcnn_losses(cls_logits, bbox_pred, labels, label_valid,
                     bbox_targets, bbox_fg):
    """Box head losses over the sampled RoIs of the whole batch.

    cls_logits: (N, C); labels: (N,) int in [0, C); label_valid: (N,) mask;
    bbox_pred: (N, 4C') tiled per class; bbox_targets: (N, 4) compact
    (encoded vs the matched gt); bbox_fg: (N,) fg mask.

    cls: softmax CE mean over valid RoIs. bbox: smooth_l1 on the label
    class's 4 predictions, summed / num valid RoIs — identical numerics to
    the reference's expanded (N, 4C) sparse layout with inside/outside
    weights (lib/roi_data/fast_rcnn.py :: _expand_bbox_targets).
    Also returns the reference's accuracy_cls metric.
    """
    valid = label_valid.astype(jnp.float32)
    n_valid = jnp.maximum(jnp.sum(valid), 1.0)

    logp = jax.nn.log_softmax(cls_logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    cls_loss = jnp.sum(nll * valid) / n_valid

    # Gather the 4 box deltas for each RoI's label class.
    num_reg_cls = bbox_pred.shape[-1] // 4
    reg_labels = jnp.where(num_reg_cls == 2,
                           jnp.minimum(labels, 1), labels)
    pred4 = jnp.take_along_axis(
        bbox_pred.astype(jnp.float32).reshape(-1, num_reg_cls, 4),
        reg_labels[:, None, None].astype(jnp.int32), axis=1)[:, 0]
    fg = bbox_fg.astype(jnp.float32)[:, None]
    bbox_loss = smooth_l1_loss(pred4, bbox_targets, fg, fg) / n_valid

    acc = jnp.sum((jnp.argmax(cls_logits, -1) == labels) * valid) / n_valid
    return cls_loss, bbox_loss, acc


def mask_rcnn_losses(mask_logits, mask_targets, mask_labels, mask_valid):
    """Mask head loss.

    mask_logits: (N, M, M, C') (C'=num_classes or 1 if class-agnostic);
    mask_targets: (N, M, M) binary {0,1}; mask_labels: (N,) class of each
    RoI (selects the channel); mask_valid: (N,) fg-RoI mask.

    BCE over all pixels of valid fg RoIs, normalized by n_valid * M^2 and
    scaled by MRCNN.WEIGHT_LOSS_MASK (the reference normalizes by the count
    of non-ignored (-1) labels; padded RoIs here are fully ignored).
    """
    n_cls = mask_logits.shape[-1]
    if n_cls > 1:
        sel = jnp.take_along_axis(
            mask_logits, mask_labels[:, None, None, None].astype(jnp.int32),
            axis=3)[..., 0]
    else:
        sel = mask_logits[..., 0]
    ce = sigmoid_ce(sel.astype(jnp.float32), mask_targets.astype(jnp.float32))
    valid = mask_valid.astype(jnp.float32)[:, None, None]
    M = mask_logits.shape[1]
    denom = jnp.maximum(jnp.sum(valid) * M * M, 1.0)
    return cfg.MRCNN.WEIGHT_LOSS_MASK * jnp.sum(ce * valid) / denom


def keypoint_losses(kps_logits, kps_targets, kps_weights):
    """Keypoint head loss: spatial softmax CE per keypoint.

    kps_logits: (N, S, S, K); kps_targets: (N, K) int bin index in [0, S^2);
    kps_weights: (N, K) visibility weights (0 for invisible / padded).

    Normalized by the number of visible keypoints when
    KRCNN.NORMALIZE_BY_VISIBLE_KEYPOINTS (reference keypoint_losses).
    """
    N, S, _, K = kps_logits.shape
    logits = kps_logits.astype(jnp.float32).transpose(0, 3, 1, 2).reshape(
        N, K, S * S)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(
        logp, kps_targets[..., None].astype(jnp.int32), axis=2)[..., 0]
    w = kps_weights.astype(jnp.float32)
    loss = jnp.sum(nll * w)
    if cfg.KRCNN.NORMALIZE_BY_VISIBLE_KEYPOINTS:
        loss = loss / jnp.maximum(jnp.sum(w), 1.0)
    else:
        loss = loss / (N * K)
    return cfg.KRCNN.LOSS_WEIGHT * loss
