"""Generalized R-CNN assembly (the only model class, as in the reference).

Functional rebuild of lib/modeling/model_builder.py :: Generalized_RCNN +
get_func: cfg strings ('FPN.fpn_ResNet50_conv5_body',
'fast_rcnn_heads.roi_2mlp_head', ...) select body/head builders; params are a
nested pytree; apply functions are pure and jit-compiled by callers.

Inference dataflow (one jit, entire batch, static shapes):

  images (B, H, W, 3)  ->  body  ->  [FPN]  ->  RPN heads
      -> in-graph proposals (B, R, 4) + valid mask
      -> RoIAlign (multilevel for FPN) -> box head -> cls/bbox outputs

The training step (losses + in-graph target assignment) lives in
models/train_graph.py; test-time box/mask/keypoint decoding in core/test.py.
"""

import functools

import jax
import jax.numpy as jnp

from detectron_tpu.core.config import cfg
from detectron_tpu.models import fast_rcnn_heads
from detectron_tpu.models import fpn as fpn_mod
from detectron_tpu.models import keypoint_rcnn_heads
from detectron_tpu.models import mask_rcnn_heads
from detectron_tpu.models import registry
from detectron_tpu.models import resnet
from detectron_tpu.models import rpn as rpn_mod
from detectron_tpu.ops import roi_align as ra_ops


# ---------------------------------------------------------------------------
# Static model spec derived from cfg
# ---------------------------------------------------------------------------

class ModelSpec:
    """Static (trace-time) facts about the configured model."""

    def __init__(self):
        self.depth, self.num_stages, _name_is_fpn = resnet.body_spec(
            cfg.MODEL.CONV_BODY)
        self.is_fpn = bool(cfg.FPN.FPN_ON)
        if self.is_fpn:
            self.body_feat_dim = cfg.FPN.DIM
            self.box_roi_levels = (cfg.FPN.ROI_MIN_LEVEL, cfg.FPN.ROI_MAX_LEVEL)
        else:
            # C4 body: res4 output
            self.body_feat_dim = 1024
        self.num_classes = cfg.MODEL.NUM_CLASSES

    @property
    def body_stride(self):
        return 16  # C4 bodies end at res4 (stride 16)


def build_spec():
    return ModelSpec()


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init_model(rng):
    """Initialize all params per cfg. Returns a nested dict pytree."""
    spec = build_spec()
    keys = jax.random.split(rng, 8)
    params = {}
    params["body"] = resnet.init_body(keys[0], spec.depth, spec.num_stages)

    if spec.is_fpn:
        params["fpn"] = fpn_mod.init_fpn(keys[1])
        if cfg.RPN.RPN_ON:
            params["rpn"] = rpn_mod.init_fpn_rpn(keys[2], cfg.FPN.DIM)
        box_roi_res = cfg.FAST_RCNN.ROI_XFORM_RESOLUTION
        # Dotted-name resolution (reference get_func): any module.symbol
        # with init_/apply_ functions works without edits here.
        head = registry.get_func(cfg.FAST_RCNN.ROI_BOX_HEAD)
        params["box_head"] = head.init(keys[3], cfg.FPN.DIM, box_roi_res)
        box_out_dim = head.out_dim()
    else:
        if cfg.RPN.RPN_ON:
            params["rpn"] = rpn_mod.init_single_scale_rpn(
                keys[2], spec.body_feat_dim)
        # C4: box head IS res5 (ResNet.ResNet_roi_conv5_head)
        head = registry.get_func(
            cfg.FAST_RCNN.ROI_BOX_HEAD or "ResNet.ResNet_roi_conv5_head")
        params["box_head"] = head.init(keys[3], 1024)
        box_out_dim = head.out_dim()

    params["box_outs"] = fast_rcnn_heads.init_fast_rcnn_outputs(
        keys[4], box_out_dim)

    if cfg.MODEL.MASK_ON:
        mask_in_dim = cfg.FPN.DIM if spec.is_fpn else 1024
        mh = registry.get_func(
            cfg.MRCNN.ROI_MASK_HEAD or
            "mask_rcnn_heads.mask_rcnn_fcn_head_v1up4convs")
        params["mask_head"] = mh.init(keys[5], mask_in_dim)
        params["mask_outs"] = mask_rcnn_heads.init_mask_outputs(
            keys[6], mh.out_dim())

    if cfg.MODEL.KEYPOINTS_ON:
        kps_in_dim = cfg.FPN.DIM if spec.is_fpn else 1024
        kh = registry.get_func(
            cfg.KRCNN.ROI_KEYPOINTS_HEAD or
            "keypoint_rcnn_heads.roi_pose_head_v1convX")
        params["kps_head"] = kh.init(keys[7], kps_in_dim)
        params["kps_outs"] = keypoint_rcnn_heads.init_keypoint_outputs(
            jax.random.fold_in(keys[7], 1), kh.out_dim())
    return params


# ---------------------------------------------------------------------------
# Forward pieces
# ---------------------------------------------------------------------------

def forward_features(params, images):
    """images (B, H, W, 3) BGR, mean-subtracted, zero-padded.
    Returns (features, scales): for FPN a list [P2..P6] + per-level scales;
    for C4 a single-element list [res4] with scale 1/16."""
    dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else \
        jnp.float32
    x = images.astype(dtype)
    spec = build_spec()
    body_p = params["body"]
    fpn_p = params.get("fpn")
    if cfg.TRAIN.FREEZE_CONV_BODY:
        # Reference TRAIN.FREEZE_CONV_BODY: the whole conv body (incl. FPN)
        # trains no parameters.
        body_p = jax.lax.stop_gradient(body_p)
        if fpn_p is not None:
            fpn_p = jax.lax.stop_gradient(fpn_p)
    outs = resnet.apply_body(body_p, x, spec.num_stages)
    if spec.is_fpn:
        return fpn_mod.apply_fpn(fpn_p, outs)
    return [outs[-1]], [1.0 / 16.0]


def forward_rpn(params, features):
    """Run the RPN head on every level. Returns per-level (cls, bbox)."""
    return [rpn_mod.apply_rpn_head(params["rpn"], f) for f in features]


def generate_proposals(rpn_outs, features, im_info, training):
    """In-graph proposal generation for the whole batch.

    im_info: (B, 3) [h, w, scale]. Returns (rois (B, R, 4), roi_scores
    (B, R), valid (B, R)) with R = RPN_POST_NMS_TOP_N for the phase.
    """
    if training:
        pre_n = cfg.TRAIN.RPN_PRE_NMS_TOP_N
        post_n = cfg.TRAIN.RPN_POST_NMS_TOP_N
        nms_thresh = cfg.TRAIN.RPN_NMS_THRESH
        min_size = cfg.TRAIN.RPN_MIN_SIZE
    else:
        pre_n = cfg.TEST.RPN_PRE_NMS_TOP_N
        post_n = cfg.TEST.RPN_POST_NMS_TOP_N
        nms_thresh = cfg.TEST.RPN_NMS_THRESH
        min_size = cfg.TEST.RPN_MIN_SIZE

    is_fpn_rpn = cfg.FPN.FPN_ON and cfg.FPN.MULTILEVEL_RPN

    # Proposal generation never backpropagates (the reference computes
    # proposals in host numpy — implicitly detached); detaching here also
    # keeps autodiff out of the non-differentiable Pallas NMS kernel.
    rpn_outs = jax.lax.stop_gradient(rpn_outs)

    level_boxes, level_scores, level_valid = [], [], []
    if is_fpn_rpn:
        anchor_cfgs = rpn_mod.fpn_anchor_config()
    else:
        anchor_cfgs = [(None, cfg.RPN.STRIDE, None)]

    for li, (cls_logits, bbox_pred) in enumerate(rpn_outs):
        if is_fpn_rpn:
            lvl, stride, size = anchor_cfgs[li]
            sizes = (size,)
            ratios = cfg.FPN.RPN_ASPECT_RATIOS
        else:
            stride = cfg.RPN.STRIDE
            sizes = cfg.RPN.SIZES
            ratios = cfg.RPN.ASPECT_RATIOS
        B, H, W, A = cls_logits.shape
        anchors = rpn_mod.level_anchors(stride, sizes, ratios, H, W)

        def one_image(cl, bp, info):
            return rpn_mod.proposals_prep_one_level(
                cl, bp, anchors, info[:2], min_size * info[2],
                pre_top_n=pre_n)

        boxes_b, scores_b = jax.vmap(one_image)(cls_logits, bbox_pred,
                                                im_info)
        from detectron_tpu.ops import nms as nms_ops
        if post_n >= boxes_b.shape[1]:
            # No per-level truncation possible (post_n covers every slot,
            # true in all standard FPN configs where per-level pre-NMS
            # top-k == post_n): keep survivors as an in-place MASK. The
            # compacted form's k=N rank top_k lowered to full variadic
            # sorts plus box/score gathers (~6 ms/batch on v5e); the
            # cross-level collect re-sorts by score anyway.
            keep = nms_ops.nms_batched_sorted_mask(
                boxes_b, scores_b, nms_thresh,
                tile_size=cfg.TPU.NMS_TILE_SIZE)
            b = boxes_b * keep[..., None]
            s = jnp.where(keep, scores_b, -jnp.inf)
            valid = keep
        else:
            # post_n truncates survivors per level (reference
            # GenerateProposalsOp semantics): compacted output required.
            idx, valid = nms_ops.nms_batched_sorted(
                boxes_b, scores_b, nms_thresh, post_n,
                tile_size=cfg.TPU.NMS_TILE_SIZE)
            b = jnp.take_along_axis(boxes_b, idx[..., None], axis=1) * \
                valid[..., None]
            s = jnp.where(valid, jnp.take_along_axis(scores_b, idx, axis=1),
                          -jnp.inf)
        level_boxes.append(b)
        level_scores.append(s)
        level_valid.append(valid)

    if len(level_boxes) == 1:
        rois, scores, valid = level_boxes[0], level_scores[0], level_valid[0]
    else:
        rois, scores, valid = jax.vmap(
            lambda *xs: rpn_mod.collect_proposals(
                list(xs[: len(level_boxes)]),
                list(xs[len(level_boxes): 2 * len(level_boxes)]),
                list(xs[2 * len(level_boxes):]),
                post_n,
            )
        )(*level_boxes, *level_scores, *level_valid)
    return rois, scores, valid


def roi_feature_transform(params, features, scales, rois, resolution,
                          sampling_ratio, method=None, impl=None,
                          out_qp=False):
    """Dispatch RoI feature extraction (reference:
    model_builder.roi_feature_transform). features: list of (B, H, W, C);
    rois: (B, R, 4). Returns (B, R, P, P, C).

    impl selects the FPN crop implementation ('pallas' | 'windowed' |
    'gather'); defaults to cfg.TPU.ROI_IMPL. The Pallas kernel is
    forward-only, so the train graph passes impl='windowed'."""
    method = method or cfg.FAST_RCNN.ROI_XFORM_METHOD
    impl = impl or cfg.TPU.ROI_IMPL
    assert method in ("RoIAlign", "RoIPoolF", "RoICrop"), method
    if method == "RoIPoolF":
        # RoIAlign is used by all e2e baselines; RoIPool is the C4 legacy
        # path (reference lib/model/roi_pooling).
        from detectron_tpu.ops import roi_pool as rp_ops
        assert len(features) == 1
        return jax.vmap(
            lambda f, r: rp_ops.roi_pool(f, r, scales[0], resolution,
                                         resolution)
        )(features[0], rois)
    if method == "RoICrop":
        # Spatial-transformer crop (reference lib/model/roi_crop +
        # model_builder.roi_feature_transform RoICrop branch, incl. the 2x
        # crop + 2x2 max-pool when cfg.CROP_RESIZE_WITH_MAX_POOL).
        from detectron_tpu.ops import roi_crop as rc_ops
        mp = cfg.CROP_RESIZE_WITH_MAX_POOL
        if len(features) == 1:
            return jax.vmap(
                lambda f, r: rc_ops.roi_crop(f, r, scales[0], resolution,
                                             resolution, max_pool=mp)
            )(features[0], rois)
        # FPN: crop on every level, then select each RoI's assigned level
        # (rare path; L x compute is acceptable vs plumbing a gather).
        lo = fpn_mod.lowest_backbone_lvl()
        k_min, k_max = cfg.FPN.ROI_MIN_LEVEL, cfg.FPN.ROI_MAX_LEVEL
        roi_feats = features[k_min - lo: k_max - lo + 1]
        roi_scales = tuple(scales[k_min - lo: k_max - lo + 1])

        def one_image_crop(per_level_feats, r):
            lvls = fpn_mod.map_rois_to_fpn_levels(r, k_min, k_max)
            outs = jnp.stack([
                rc_ops.roi_crop(f, r, s, resolution, resolution, max_pool=mp)
                for f, s in zip(per_level_feats, roi_scales)])  # (L,R,P,P,C)
            sel = (lvls - k_min).astype(jnp.int32)
            return jnp.take_along_axis(
                outs, sel[None, :, None, None, None], axis=0)[0]

        return jax.vmap(one_image_crop, in_axes=(0, 0))(roi_feats, rois)

    if len(features) == 1:
        return ra_ops.roi_align_batched(
            features[0], rois, scales[0], resolution, resolution,
            sampling_ratio, chunk=cfg.TPU.ROI_CHUNK)

    # FPN: windowed (default) or gather-based crop over the pyramid,
    # RoI-chunked — the production TPU paths. Only ROI_MIN..ROI_MAX levels
    # participate (P6 is RPN-only).
    lo = fpn_mod.lowest_backbone_lvl()
    k_min, k_max = cfg.FPN.ROI_MIN_LEVEL, cfg.FPN.ROI_MAX_LEVEL
    roi_feats = features[k_min - lo: k_max - lo + 1]
    roi_scales = tuple(scales[k_min - lo: k_max - lo + 1])

    if impl == "pallas":
        import jax as _jax

        from detectron_tpu.ops import windowed_roi as win_ops

        interp = _jax.default_backend() == "cpu"
        if cfg.TPU.ROI_LADDER and len(roi_feats) > 1:
            # Window-rung LADDER (default): rung-sorted segmented kernel
            # sweeps — each RoI gets exactly the window shape it needs, so
            # elongated mid-level RoIs are exact (the single-window path
            # clamps them) AND the common case pays a smaller DMA window.
            # Trainable via custom_vjp (exact gather-transpose backward).
            rungs = tuple(tuple(r) for r in cfg.TPU.ROI_RUNGS)
            return win_ops.multilevel_roi_align_ladder_trainable(
                list(roi_feats), tuple(roi_scales), rois, resolution,
                sampling_ratio, k_min, k_max,
                cfg.FPN.ROI_CANONICAL_SCALE, cfg.FPN.ROI_CANONICAL_LEVEL,
                rungs, cfg.TPU.ROI_ROIS_PER_STEP, interp, out_qp,
                cfg.TPU.ROI_LADDER_NARROW)

        # Single-window hybrid: Pallas window-DMA kernel below the top level
        # + dense exact top level (no sample clamping for oversize RoIs,
        # but elongated mid-level RoIs clamp). Trainable via custom_vjp
        # (exact linear-transpose backward).
        return win_ops.multilevel_roi_align_pallas_hybrid(
            roi_feats, tuple(roi_scales), rois, resolution, sampling_ratio,
            k_min, k_max,
            canonical_scale=cfg.FPN.ROI_CANONICAL_SCALE,
            canonical_level=cfg.FPN.ROI_CANONICAL_LEVEL,
            window=cfg.TPU.ROI_WINDOW,
            rois_per_step=cfg.TPU.ROI_ROIS_PER_STEP,
            interpret=interp,
            trainable=True, out_qp=out_qp)

    if out_qp and impl != "pallas":
        raise ValueError("out_qp is a pallas-path optimization")

    if impl == "windowed":
        from detectron_tpu.ops import windowed_roi as win_ops

        def one_image(per_level_feats, r):
            return win_ops.multilevel_roi_align_hybrid(
                per_level_feats, roi_scales, r, resolution, sampling_ratio,
                k_min, k_max,
                canonical_scale=cfg.FPN.ROI_CANONICAL_SCALE,
                canonical_level=cfg.FPN.ROI_CANONICAL_LEVEL,
                window=cfg.TPU.ROI_WINDOW,
                chunk=cfg.TPU.ROI_CHUNK)
    else:
        from detectron_tpu.ops import multilevel_roi as ml_ops

        def one_image(per_level_feats, r):
            return ml_ops.multilevel_roi_align(
                per_level_feats, roi_scales, r, resolution, sampling_ratio,
                k_min, k_max,
                canonical_scale=cfg.FPN.ROI_CANONICAL_SCALE,
                canonical_level=cfg.FPN.ROI_CANONICAL_LEVEL,
                chunk=cfg.TPU.ROI_CHUNK)

    return jax.vmap(one_image, in_axes=(0, 0))(roi_feats, rois)


def _c4_crop_and_head(params, feat_one, rois_one, scale):
    """C4 path for ONE image: fused (RoIAlign -> res5 -> avgpool) evaluated
    in RoI chunks so the (R, 14, 14, 1024) pooled features never fully
    materialize (they would be GBs at R=1000 test proposals)."""
    R = rois_one.shape[0]
    chunk = min(cfg.TPU.ROI_CHUNK, R)
    n_chunks = max(1, -(-R // chunk))
    pad = n_chunks * chunk - R
    rois_p = jnp.pad(rois_one, ((0, pad), (0, 0))) if pad else rois_one
    rois_c = rois_p.reshape(n_chunks, chunk, 4)
    res = cfg.FAST_RCNN.ROI_XFORM_RESOLUTION

    def one(rc):
        pooled = ra_ops.roi_align(
            feat_one, rc, scale, res, res,
            cfg.FAST_RCNN.ROI_XFORM_SAMPLING_RATIO)
        return resnet.apply_roi_conv5_head(params["box_head"], pooled)

    out = jax.lax.map(one, rois_c)
    return out.reshape(n_chunks * chunk, -1)[:R]


def forward_box_outputs(params, features, scales, rois, impl=None):
    """RoI transform + box head + box outputs for the whole batch.
    rois: (B, R, 4) -> (cls_logits (B, R, C), bbox_pred (B, R, 4C'))."""
    spec = build_spec()
    B, R = rois.shape[:2]

    if spec.is_fpn:
        head = registry.get_func(cfg.FAST_RCNN.ROI_BOX_HEAD)
        # Heads that flatten the pooled block into an FC can absorb a
        # (q, p)-transposed pooled layout as a weight-row permutation, so
        # the Pallas kernel skips its per-step output transpose (out_qp).
        # Only the RoIAlign pallas path produces (q, p) output; RoIPoolF /
        # RoICrop return early in roi_feature_transform in (p, q) order.
        use_qp = (head.supports_qp
                  and (impl or cfg.TPU.ROI_IMPL) == "pallas"
                  and cfg.FAST_RCNN.ROI_XFORM_METHOD == "RoIAlign")
        roi_feat = roi_feature_transform(
            params, features, scales, rois,
            cfg.FAST_RCNN.ROI_XFORM_RESOLUTION,
            cfg.FAST_RCNN.ROI_XFORM_SAMPLING_RATIO, impl=impl,
            out_qp=use_qp)
        flat = roi_feat.reshape((B * R,) + roi_feat.shape[2:])
        if head.supports_qp:
            feat = head.apply(params["box_head"], flat, qp_order=use_qp)
        else:
            feat = head.apply(params["box_head"], flat)
    else:
        feat = jax.vmap(
            lambda f, r: _c4_crop_and_head(params, f, r, scales[0])
        )(features[0], rois)
        feat = feat.reshape(B * R, -1)

    cls_logits, bbox_pred = fast_rcnn_heads.apply_fast_rcnn_outputs(
        params["box_outs"], feat)
    return (cls_logits.reshape(B, R, -1), bbox_pred.reshape(B, R, -1), feat)
