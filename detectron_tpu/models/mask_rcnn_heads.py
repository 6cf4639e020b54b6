"""Mask R-CNN heads and outputs.

Rebuilds lib/modeling/mask_rcnn_heads.py (mask_rcnn_fcn_head_v1up4convs,
mask_rcnn_fcn_head_v1up, mask_rcnn_fcn_head_v0up/v0upshare,
mask_rcnn_outputs). The v0upshare variant shares res5 weights with the C4 box
head; in this functional design sharing is by passing the same res5 params to
both apply functions (no weight-copy plumbing needed).
"""

import jax
import jax.numpy as jnp

from detectron_tpu.core.config import cfg
from detectron_tpu.models import layers as L
from detectron_tpu.models import resnet


def _n_convs_for(head_name):
    if "v1up4convs" in head_name:
        return 4
    if "v1up" in head_name:
        return 2
    return 0


def init_mask_head(rng, dim_in, head_name=None):
    head_name = head_name or cfg.MRCNN.ROI_MASK_HEAD
    use_gn = head_name.endswith("_gn")
    dim_inner = cfg.MRCNN.DIM_REDUCED
    init = cfg.MRCNN.CONV_INIT
    if "v0up" in head_name:
        # res5-based head (C4 models)
        k = jax.random.split(rng, 2)
        p = {"deconv": L.init_conv(k[1], 2, 2, 2048, dim_inner,
                                   weight_init=init)}
        if not head_name.endswith("share"):
            p["res5"] = resnet.init_roi_conv5_head(k[0], dim_in)["res5"]
        return p
    n = _n_convs_for(head_name)
    ks = jax.random.split(rng, n + 1)
    p = {"convs": [], "gns": [] if use_gn else None}
    d = dim_in
    for i in range(n):
        p["convs"].append(
            L.init_conv(ks[i], 3, 3, d, dim_inner, weight_init=init,
                        bias=not use_gn)
        )
        if use_gn:
            p["gns"].append(L.init_group_norm(dim_inner))
        d = dim_inner
    p["deconv"] = L.init_conv(ks[-1], 2, 2, d, dim_inner, weight_init=init)
    if p["gns"] is None:
        del p["gns"]
    return p


def apply_mask_head(p, roi_feat, shared_res5_params=None):
    """roi_feat: (R, P, P, C) -> (R, 2P, 2P, DIM_REDUCED)."""
    head_name = cfg.MRCNN.ROI_MASK_HEAD
    if "v0up" in head_name:
        res5 = shared_res5_params if head_name.endswith("share") else p["res5"]
        ng = cfg.RESNETS.NUM_GROUPS
        if cfg.RESNETS.RES5_DILATION != 1:
            stride, dil = 1, cfg.RESNETS.RES5_DILATION
        else:
            stride, dil = 2, 1
        x = resnet.apply_stage(res5, roi_feat, stride, dil, ng)
    else:
        x = roi_feat
        dilation = cfg.MRCNN.DILATION
        for i, cp in enumerate(p["convs"]):
            x = L.conv2d(cp, x, stride=1, padding=dilation, dilation=dilation)
            if "gns" in p:
                g = L.get_group_gn(
                    p["gns"][i]["s"].shape[0], cfg.GROUP_NORM.DIM_PER_GP,
                    cfg.GROUP_NORM.NUM_GROUPS)
                x = L.group_norm(p["gns"][i], x, g, cfg.GROUP_NORM.EPSILON)
            x = L.relu(x)
    x = L.conv_transpose2d(p["deconv"], x, stride=2, torch_padding=0)
    return L.relu(x)


def init_mask_outputs(rng, dim_in):
    n_cls = cfg.MODEL.NUM_CLASSES if cfg.MRCNN.CLS_SPECIFIC_MASK else 1
    if cfg.MRCNN.USE_FC_OUTPUT:
        res = cfg.MRCNN.RESOLUTION
        return {"mask_fcn_logits": L.init_fc(
            rng, dim_in * res * res, n_cls * res * res,
            weight_init="GaussianFill", std=0.001)}
    return {"mask_fcn_logits": L.init_conv(
        rng, 1, 1, dim_in, n_cls,
        weight_init="GaussianFill" if cfg.MRCNN.CONV_INIT == "GaussianFill"
        else cfg.MRCNN.CONV_INIT,
        std=0.001)}


def apply_mask_outputs(p, x):
    """x: (R, M, M, D) -> mask logits (R, M, M, n_cls)."""
    if cfg.MRCNN.USE_FC_OUTPUT:
        R = x.shape[0]
        res = cfg.MRCNN.RESOLUTION
        n_cls = cfg.MODEL.NUM_CLASSES if cfg.MRCNN.CLS_SPECIFIC_MASK else 1
        flat = jnp.transpose(x, (0, 3, 1, 2)).reshape(R, -1)
        out = L.fc(p["mask_fcn_logits"], flat)
        return out.reshape(R, n_cls, res, res).transpose(0, 2, 3, 1)
    return L.conv2d(p["mask_fcn_logits"], x, stride=1, padding=0)
