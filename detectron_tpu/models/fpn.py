"""Feature Pyramid Network construction + FPN level utilities.

Functional rebuild of the reference's lib/modeling/FPN.py (symbols: fpn,
fpn_ResNet50_conv5_body and friends, fpn_level_info_ResNet50_conv5,
map_rois_to_fpn_levels, add_multilevel_roi_blobs): 1x1 laterals, nearest
top-down, 3x3 posthoc convs, P6 by subsampling (or extra stride-2 convs when
FPN.EXTRA_CONV_LEVELS), optional GroupNorm and ZERO_INIT_LATERAL.

TPU-first difference: the multi-level RoI *distribution* never materializes
dynamic per-level RoI lists (the reference's rois_fpn2..5 +
rois_idx_restore_int32 reshuffle). Instead every RoI is pooled from every
level with static shapes and the per-RoI level assignment selects the result
(see multilevel_roi_align) — no reordering, no host sync, MXU-friendly.
"""

import jax
import jax.numpy as jnp

from detectron_tpu.core.config import cfg
from detectron_tpu.models import layers as L
from detectron_tpu.ops import roi_align as ra_ops

# Per-stage output dims of conv5 ResNet/ResNeXt bodies, res2..res5 order.
def _body_dims():
    return [256, 512, 1024, 2048]


def lowest_backbone_lvl():
    return 2  # res2 => P2


def highest_backbone_lvl():
    return 5  # res5 => P5


def init_fpn(rng, body_dims=None):
    """Lateral+posthoc conv params. Keys mirror Caffe2 blob names:
    fpn_inner_resN / fpn_resN (we drop the '_<last block>_sum' suffix; the
    weight importer re-attaches it)."""
    dims = body_dims or _body_dims()
    fpn_dim = cfg.FPN.DIM
    use_gn = cfg.FPN.USE_GN
    n = len(dims)
    ks = jax.random.split(rng, 2 * n + 2)
    p = {}
    for i, d in enumerate(dims):  # i=0 -> res2 ... i=3 -> res5
        lvl = i + 2
        lateral_init = "Zero" if (cfg.FPN.ZERO_INIT_LATERAL and lvl != 5) \
            else "XavierFill"
        p["fpn_inner_res{}".format(lvl)] = L.init_conv(
            ks[2 * i], 1, 1, d, fpn_dim, weight_init="XavierFill"
            if lvl == 5 else lateral_init, bias=not use_gn)
        if use_gn:
            p["fpn_inner_res{}_gn".format(lvl)] = L.init_group_norm(fpn_dim)
        p["fpn_res{}".format(lvl)] = L.init_conv(
            ks[2 * i + 1], 3, 3, fpn_dim, fpn_dim, weight_init="XavierFill",
            bias=not use_gn)
        if use_gn:
            p["fpn_res{}_gn".format(lvl)] = L.init_group_norm(fpn_dim)
    if cfg.FPN.EXTRA_CONV_LEVELS:
        in_d = dims[-1]
        for j, lvl in enumerate(range(6, cfg.FPN.RPN_MAX_LEVEL + 1)):
            p["fpn_{}".format(lvl)] = L.init_conv(
                ks[2 * n + j], 3, 3, in_d, fpn_dim, weight_init="XavierFill")
            in_d = fpn_dim
    return p


def _maybe_gn(p, name, x):
    if cfg.FPN.USE_GN:
        gp = p[name + "_gn"]
        g = L.get_group_gn(gp["s"].shape[0], cfg.GROUP_NORM.DIM_PER_GP,
                           cfg.GROUP_NORM.NUM_GROUPS)
        return L.group_norm(gp, x, g, cfg.GROUP_NORM.EPSILON)
    return x


def apply_fpn(p, body_outs):
    """body_outs: [res2, res3, res4, res5] (NHWC). Returns (pyramid, scales):
    pyramid = [P2, P3, P4, P5(, P6...)] coarse..fine ordered fine->coarse
    (P2 first), scales = spatial scale per level (1/4, 1/8, ...)."""
    n = len(body_outs)
    # Top-down pathway, coarsest first.
    inners = []
    td = None
    for i in reversed(range(n)):  # res5 ... res2
        lvl = i + 2
        lat = L.conv2d(p["fpn_inner_res{}".format(lvl)], body_outs[i],
                       stride=1, padding=0)
        lat = _maybe_gn(p, "fpn_inner_res{}".format(lvl), lat)
        if td is not None:
            B, H, W, C = lat.shape
            up = jnp.repeat(jnp.repeat(td, 2, axis=1), 2, axis=2)[:, :H, :W, :]
            lat = lat + up
        td = lat
        inners.append((lvl, lat))
    pyramid = []
    scales = []
    for lvl, lat in sorted(inners):  # P2 first
        out = L.conv2d(p["fpn_res{}".format(lvl)], lat, stride=1, padding=1)
        out = _maybe_gn(p, "fpn_res{}".format(lvl), out)
        pyramid.append(out)
        scales.append(1.0 / (2 ** lvl))

    max_lvl = cfg.FPN.RPN_MAX_LEVEL if cfg.FPN.MULTILEVEL_RPN else \
        highest_backbone_lvl()
    if cfg.FPN.EXTRA_CONV_LEVELS and max_lvl > highest_backbone_lvl():
        h = body_outs[-1]
        for lvl in range(6, max_lvl + 1):
            if lvl > 6:
                h = L.relu(h)
            h = L.conv2d(p["fpn_{}".format(lvl)], h, stride=2, padding=1)
            pyramid.append(h)
            scales.append(1.0 / (2 ** lvl))
    elif max_lvl == highest_backbone_lvl() + 1:
        # P6 via stride-2 subsampling of P5 (reference: max_pool k=1 s=2)
        p6 = pyramid[-1][:, ::2, ::2, :]
        pyramid.append(p6)
        scales.append(scales[-1] / 2.0)
    return pyramid, scales


# ---------------------------------------------------------------------------
# RoI -> FPN level assignment (eq. 1 of the FPN paper)
# ---------------------------------------------------------------------------

def map_rois_to_fpn_levels(rois, k_min=None, k_max=None):
    """rois: (..., 4) in image coords. Returns integer levels clipped to
    [k_min, k_max]. Matches lib/modeling/FPN.py :: map_rois_to_fpn_levels."""
    k_min = cfg.FPN.ROI_MIN_LEVEL if k_min is None else k_min
    k_max = cfg.FPN.ROI_MAX_LEVEL if k_max is None else k_max
    w = rois[..., 2] - rois[..., 0] + 1.0
    h = rois[..., 3] - rois[..., 1] + 1.0
    s = jnp.sqrt(jnp.maximum(w * h, 1e-12))
    s0 = cfg.FPN.ROI_CANONICAL_SCALE
    lvl0 = cfg.FPN.ROI_CANONICAL_LEVEL
    target = jnp.floor(lvl0 + jnp.log2(s / s0 + 1e-6))
    return jnp.clip(target, k_min, k_max).astype(jnp.int32)


def multilevel_roi_align(pyramid, scales, rois, pooled_h, pooled_w,
                         sampling_ratio, k_min=None, k_max=None):
    """RoIAlign over an FPN pyramid with static shapes.

    pyramid: per-level (H_l, W_l, C) features for ONE image (use vmap for a
    batch); rois: (R, 4). Every RoI is pooled from every in-range level and
    the per-RoI level assignment selects the output — replaces the
    reference's dynamic per-level splits + rois_idx_restore reordering
    (lib/modeling/collect_and_distribute_fpn_rpn_proposals.py :: distribute).
    """
    k_min = cfg.FPN.ROI_MIN_LEVEL if k_min is None else k_min
    k_max = cfg.FPN.ROI_MAX_LEVEL if k_max is None else k_max
    lvls = map_rois_to_fpn_levels(rois, k_min, k_max)  # (R,)
    out = None
    for lvl in range(k_min, k_max + 1):
        feat = pyramid[lvl - lowest_backbone_lvl()]
        pooled = ra_ops.roi_align(
            feat, rois, scales[lvl - lowest_backbone_lvl()],
            pooled_h, pooled_w, sampling_ratio,
        )  # (R, P, Q, C)
        sel = (lvls == lvl)[:, None, None, None]
        out = jnp.where(sel, pooled, out) if out is not None else \
            jnp.where(sel, pooled, 0.0)
    return out
