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


def _fc_on_nhwc(fc_p, roi_feat, qp_order=False):
    """FC over flattened RoI features whose WEIGHT rows are in Caffe2
    (C, P, P) flatten order, applied to NHWC activations.

    Instead of transposing the (R, P, P, C) activations to channel-first
    (an (R*P*P*C)-sized relayout — ~800 MB and 6.6 ms/step at production
    box-head shapes, xprof: reshape.99 + copy.448), permute the weight's
    ROWS once per step (a 25 MB transpose XLA hoists next to the matmul):
    w[(c,p,q), h] -> w[(p,q,c), h]. Numerically identical; params keep the
    Caffe2 layout so the weight importer and its layout tests are
    untouched."""
    R, P, Q, C = roi_feat.shape
    w = fc_p["w"]
    H = w.shape[-1]
    if qp_order:
        # roi_feat arrives (R, Q, P, C) — the Pallas kernel's natural
        # output order (out_qp): permute rows to (q, p, c) instead.
        w_nhwc = w.reshape(C, P, Q, H).transpose(2, 1, 0, 3).reshape(-1, H)
    else:
        w_nhwc = w.reshape(C, P, Q, H).transpose(1, 2, 0, 3).reshape(-1, H)
    x = roi_feat.reshape(R, -1)
    y = x @ w_nhwc.astype(x.dtype)
    if "b" in fc_p:
        y = y + fc_p["b"].astype(y.dtype)
    return y


def apply_roi_2mlp_head(p, roi_feat, qp_order=False):
    """roi_feat: (R, P, P, C) -> (R, MLP_HEAD_DIM).

    Caffe2 flattens (C, P, P) feature blocks; to load Detectron fc6
    weights verbatim the weight rows are permuted to NHWC-flatten order
    (see _fc_on_nhwc — cheaper than transposing the activations)."""
    x = L.relu(_fc_on_nhwc(p["fc6"], roi_feat, qp_order=qp_order))
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
    return L.relu(_fc_on_nhwc(p["fc6"], x))


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
