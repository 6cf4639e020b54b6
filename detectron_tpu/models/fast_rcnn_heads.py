"""Fast R-CNN box heads and outputs.

Rebuilds lib/modeling/fast_rcnn_heads.py (roi_2mlp_head, roi_Xconv1fc_head,
roi_Xconv1fc_gn_head, fast_rcnn_outputs, fast_rcnn_losses). Losses live in
models/losses.py; this module is the pure forward.
"""

import jax
import jax.numpy as jnp

from detectron_tpu.core.config import cfg
from detectron_tpu.models import layers as L


def init_roi_2mlp_head(rng, dim_in, roi_res):
    hidden = cfg.FAST_RCNN.MLP_HEAD_DIM
    ks = jax.random.split(rng, 2)
    return {
        "fc6": L.init_fc(ks[0], dim_in * roi_res * roi_res, hidden,
                         weight_init="XavierFill"),
        "fc7": L.init_fc(ks[1], hidden, hidden, weight_init="XavierFill"),
    }


def apply_roi_2mlp_head(p, roi_feat):
    """roi_feat: (R, P, P, C) -> (R, MLP_HEAD_DIM).

    Caffe2 flattens (C, P, P) feature blocks; to load Detectron fc6 weights
    verbatim we transpose to channel-first before flattening.
    """
    R = roi_feat.shape[0]
    x = jnp.transpose(roi_feat, (0, 3, 1, 2)).reshape(R, -1)
    x = L.relu(L.fc(p["fc6"], x))
    x = L.relu(L.fc(p["fc7"], x))
    return x


def init_roi_Xconv1fc_head(rng, dim_in, roi_res, use_gn=False):
    n_convs = cfg.FAST_RCNN.NUM_STACKED_CONVS
    conv_dim = cfg.FAST_RCNN.CONV_HEAD_DIM
    hidden = cfg.FAST_RCNN.MLP_HEAD_DIM
    ks = jax.random.split(rng, n_convs + 1)
    p = {"convs": [], "gns": [] if use_gn else None}
    d = dim_in
    for i in range(n_convs):
        p["convs"].append(
            L.init_conv(ks[i], 3, 3, d, conv_dim, weight_init="MSRAFill",
                        bias=not use_gn)
        )
        if use_gn:
            p["gns"].append(L.init_group_norm(conv_dim))
        d = conv_dim
    p["fc6"] = L.init_fc(ks[-1], conv_dim * roi_res * roi_res, hidden,
                         weight_init="XavierFill")
    if p["gns"] is None:
        del p["gns"]
    return p


def apply_roi_Xconv1fc_head(p, roi_feat):
    x = roi_feat
    for i, cp in enumerate(p["convs"]):
        x = L.conv2d(cp, x, stride=1, padding=1)
        if "gns" in p:
            g = L.get_group_gn(
                p["gns"][i]["s"].shape[0], cfg.GROUP_NORM.DIM_PER_GP,
                cfg.GROUP_NORM.NUM_GROUPS)
            x = L.group_norm(p["gns"][i], x, g, cfg.GROUP_NORM.EPSILON)
        x = L.relu(x)
    R = x.shape[0]
    x = jnp.transpose(x, (0, 3, 1, 2)).reshape(R, -1)
    return L.relu(L.fc(p["fc6"], x))


def init_fast_rcnn_outputs(rng, dim_in):
    num_classes = cfg.MODEL.NUM_CLASSES
    num_bbox_reg_classes = 2 if cfg.MODEL.CLS_AGNOSTIC_BBOX_REG else num_classes
    ks = jax.random.split(rng, 2)
    return {
        "cls_score": L.init_fc(ks[0], dim_in, num_classes,
                               weight_init="GaussianFill", std=0.01),
        "bbox_pred": L.init_fc(ks[1], dim_in, 4 * num_bbox_reg_classes,
                               weight_init="GaussianFill", std=0.001),
    }


def apply_fast_rcnn_outputs(p, x):
    """x: (R, D) -> (cls_logits (R, C), bbox_pred (R, 4*C'))."""
    return L.fc(p["cls_score"], x), L.fc(p["bbox_pred"], x)
