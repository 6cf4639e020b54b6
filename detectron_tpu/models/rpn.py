"""RPN heads and in-graph proposal generation.

Rebuilds the reference's lib/modeling/rpn_heads.py (single_scale_rpn_outputs),
lib/modeling/FPN.py :: fpn_rpn_outputs, lib/modeling/generate_proposals.py ::
GenerateProposalsOp and lib/modeling/collect_and_distribute_fpn_rpn_proposals
.py :: CollectAndDistributeFpnRpnProposalsOp (collect half).

TPU-first: where the reference copies RPN outputs to the host and loops over
images in numpy (decode -> clip -> Cython NMS per image per level), here
proposal generation is fully in-graph: anchors are static constants, top-k
preselection uses lax.top_k, decoding/clipping are vectorized, and NMS is the
padded tiled kernel from ops/nms.py. Per-image work is vmapped; shapes are
static everywhere; validity flows as masks.
"""

import functools

import jax
import jax.numpy as jnp

from detectron_tpu.core.config import cfg
from detectron_tpu.models import layers as L
from detectron_tpu.ops import anchors as anchor_ops
from detectron_tpu.ops import box_ops
from detectron_tpu.ops import nms as nms_ops
from detectron_tpu.ops import topk as topk_ops


# ---------------------------------------------------------------------------
# Heads
# ---------------------------------------------------------------------------

def num_cell_anchors():
    if cfg.FPN.FPN_ON and cfg.FPN.MULTILEVEL_RPN:
        return len(cfg.FPN.RPN_ASPECT_RATIOS)
    return len(cfg.RPN.ASPECT_RATIOS) * len(cfg.RPN.SIZES)


def init_single_scale_rpn(rng, dim_in):
    """C4-style RPN head (reference: single_scale_rpn_outputs)."""
    dim_out = dim_in if cfg.RPN.OUT_DIM_AS_IN_DIM else cfg.RPN.OUT_DIM
    A = num_cell_anchors()
    ks = jax.random.split(rng, 3)
    return {
        "conv_rpn": L.init_conv(ks[0], 3, 3, dim_in, dim_out,
                                weight_init="GaussianFill", std=0.01),
        "rpn_cls_logits": L.init_conv(ks[1], 1, 1, dim_out, A,
                                      weight_init="GaussianFill", std=0.01),
        "rpn_bbox_pred": L.init_conv(ks[2], 1, 1, dim_out, 4 * A,
                                     weight_init="GaussianFill", std=0.01),
    }


def apply_rpn_head(p, feat):
    """feat: (B, H, W, C) -> (cls_logits (B,H,W,A), bbox_pred (B,H,W,4A))."""
    h = L.relu(L.conv2d(p["conv_rpn"], feat, stride=1, padding=1))
    cls_logits = L.conv2d(p["rpn_cls_logits"], h, stride=1, padding=0)
    bbox_pred = L.conv2d(p["rpn_bbox_pred"], h, stride=1, padding=0)
    return cls_logits, bbox_pred


def init_fpn_rpn(rng, dim_in):
    """FPN RPN head — one set of params shared across all pyramid levels
    (reference: fpn_rpn_outputs shares conv weights across levels)."""
    return init_single_scale_rpn(rng, dim_in)


# ---------------------------------------------------------------------------
# In-graph proposal generation
# ---------------------------------------------------------------------------

def level_anchors(stride, sizes, aspect_ratios, feat_h, feat_w):
    """Static (H*W*A, 4) anchor field as a jnp constant."""
    return jnp.asarray(
        anchor_ops.anchor_field(stride, sizes, aspect_ratios, feat_h, feat_w)
    )


@functools.partial(jax.jit, static_argnames=("pre_top_n",))
def proposals_prep_one_level(cls_logits, bbox_pred, anchors, im_hw,
                             min_size_scaled, pre_top_n):
    """Decode/clip/filter the top pre_top_n proposals for ONE image and ONE
    level, WITHOUT NMS (which runs batched over images afterwards). Returns
    (boxes (k, 4) score-descending, masked_scores (k,))."""
    H, W, A = cls_logits.shape
    n = H * W * A
    logits = cls_logits.reshape(n).astype(jnp.float32)
    deltas = bbox_pred.reshape(n, 4).astype(jnp.float32)

    k = min(pre_top_n, n)
    # Select on raw logits (sigmoid is monotonic: same top-k); sigmoid only
    # the k winners. topk_chunked beats both XLA's native TopK chunking
    # (~6.5 ms for the P2 map at batch 32 — see PERF.md) and the
    # radix-select in ops/topk.py (34 ms, scatter-bound).
    top_logits, top_idx = topk_ops.topk_chunked(logits, k)
    top_scores = jax.nn.sigmoid(top_logits)
    boxes = box_ops.bbox_transform(anchors[top_idx], deltas[top_idx],
                                   (1.0, 1.0, 1.0, 1.0))
    boxes = box_ops.clip_boxes_to_image(boxes, im_hw[0], im_hw[1])
    keep = box_ops.small_box_mask(boxes, min_size_scaled)
    return boxes, jnp.where(keep, top_scores, -jnp.inf)


@functools.partial(jax.jit, static_argnames=("pre_top_n", "post_top_n"))
def proposals_one_level(cls_logits, bbox_pred, anchors, im_hw, min_size_scaled,
                        pre_top_n, post_top_n, nms_thresh):
    """Proposals for ONE image and ONE level.

    cls_logits: (H, W, A) raw logits; bbox_pred: (H, W, 4A);
    anchors: (H*W*A, 4); im_hw: (2,) actual (h, w) of the image inside the
    padded canvas; min_size_scaled: scalar (RPN_MIN_SIZE * im_scale).

    Returns (boxes (post_n, 4), scores (post_n,), valid (post_n,)).
    Matches GenerateProposalsOp semantics: sigmoid scores, top-k preselect,
    decode with unit weights, clip, min-size filter, greedy NMS.
    """
    H, W, A = cls_logits.shape
    n = H * W * A
    logits = cls_logits.reshape(n).astype(jnp.float32)
    deltas = bbox_pred.reshape(n // A, A, 4).reshape(n, 4).astype(jnp.float32)

    k = min(pre_top_n, n)
    top_logits, top_idx = topk_ops.topk_chunked(logits, k)
    top_scores = jax.nn.sigmoid(top_logits)
    top_deltas = deltas[top_idx]
    top_anchors = anchors[top_idx]

    boxes = box_ops.bbox_transform(top_anchors, top_deltas,
                                   (1.0, 1.0, 1.0, 1.0))
    boxes = box_ops.clip_boxes_to_image(boxes, im_hw[0], im_hw[1])

    keep = box_ops.small_box_mask(boxes, min_size_scaled)
    masked_scores = jnp.where(keep, top_scores, -jnp.inf)

    # `boxes` come from lax.top_k, so scores are descending (the min-size
    # mask only inserts -inf holes, which NMS treats as invalid): skip the
    # internal sort.
    idx, valid = nms_ops.nms_padded(
        boxes, masked_scores, nms_thresh, max_output_size=post_top_n,
        tile_size=cfg.TPU.NMS_TILE_SIZE, presorted=True,
    )
    out_boxes = boxes[idx] * valid[:, None]
    out_scores = jnp.where(valid, masked_scores[idx], -jnp.inf)
    return out_boxes, out_scores, valid


def collect_proposals(level_boxes, level_scores, level_valid, post_top_n):
    """Merge per-level proposals into the global top-N by score (reference:
    CollectAndDistributeFpnRpnProposalsOp.collect). All inputs are lists of
    (post_n_l, ...) arrays for one image."""
    boxes = jnp.concatenate(level_boxes, axis=0)
    scores = jnp.concatenate(level_scores, axis=0)
    valid = jnp.concatenate(level_valid, axis=0)
    scores = jnp.where(valid, scores, -jnp.inf)
    k = min(post_top_n, scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(scores, k)
    return boxes[top_idx], top_scores, jnp.isfinite(top_scores)


def fpn_anchor_config():
    """(level, stride, size) triples for the FPN RPN levels."""
    out = []
    for lvl in range(cfg.FPN.RPN_MIN_LEVEL, cfg.FPN.RPN_MAX_LEVEL + 1):
        stride = 2 ** lvl
        size = cfg.FPN.RPN_ANCHOR_START_SIZE * (
            2 ** (lvl - cfg.FPN.RPN_MIN_LEVEL)
        )
        out.append((lvl, stride, size))
    return out
