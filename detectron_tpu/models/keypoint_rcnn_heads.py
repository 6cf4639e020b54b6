"""Keypoint R-CNN head and outputs.

Rebuilds lib/modeling/keypoint_rcnn_heads.py (roi_pose_head_v1convX,
keypoint_outputs): an 8-conv tower, optional learned deconv output, and a
frozen-bilinear upsample (the reference's mynn.BilinearInterpolation2d)
realized with jax.image.resize-equivalent transposed conv.
"""

import jax
import jax.numpy as jnp

from detectron_tpu.core.config import cfg
from detectron_tpu.models import init as finit
from detectron_tpu.models import layers as L


def init_pose_head(rng, dim_in):
    n = cfg.KRCNN.NUM_STACKED_CONVS
    dim = cfg.KRCNN.CONV_HEAD_DIM
    kernel = cfg.KRCNN.CONV_HEAD_KERNEL
    ks = jax.random.split(rng, n)
    convs = []
    d = dim_in
    for i in range(n):
        convs.append(
            L.init_conv(ks[i], kernel, kernel, d, dim,
                        weight_init=cfg.KRCNN.CONV_INIT, std=0.01)
        )
        d = dim
    return {"convs": convs}


def apply_pose_head(p, roi_feat):
    x = roi_feat
    pad = cfg.KRCNN.CONV_HEAD_KERNEL // 2
    for cp in p["convs"]:
        x = L.relu(L.conv2d(cp, x, stride=1, padding=pad))
    return x


def init_keypoint_outputs(rng, dim_in):
    nkps = cfg.KRCNN.NUM_KEYPOINTS
    p = {}
    ks = jax.random.split(rng, 2)
    if cfg.KRCNN.USE_DECONV:
        p["kps_deconv"] = L.init_conv(
            ks[0], cfg.KRCNN.DECONV_KERNEL, cfg.KRCNN.DECONV_KERNEL,
            dim_in, cfg.KRCNN.DECONV_DIM, weight_init=cfg.KRCNN.CONV_INIT)
        dim_in = cfg.KRCNN.DECONV_DIM
    if cfg.KRCNN.USE_DECONV_OUTPUT:
        p["kps_score"] = L.init_conv(
            ks[1], cfg.KRCNN.DECONV_KERNEL, cfg.KRCNN.DECONV_KERNEL,
            dim_in, nkps, weight_init=cfg.KRCNN.CONV_INIT, std=0.001)
    else:
        p["kps_score"] = L.init_conv(
            ks[1], 1, 1, dim_in, nkps, weight_init=cfg.KRCNN.CONV_INIT,
            std=0.001)
    return p


def apply_keypoint_outputs(p, x):
    """x: (R, P, P, D) -> heatmap logits (R, S, S, NUM_KEYPOINTS) where S =
    HEATMAP_SIZE after deconv/upsampling."""
    if cfg.KRCNN.USE_DECONV:
        x = L.relu(L.conv_transpose2d(p["kps_deconv"], x, stride=2,
                                      torch_padding=int(
                                          cfg.KRCNN.DECONV_KERNEL / 2 - 1)))
    if cfg.KRCNN.USE_DECONV_OUTPUT:
        x = L.conv_transpose2d(p["kps_score"], x, stride=2,
                               torch_padding=int(
                                   cfg.KRCNN.DECONV_KERNEL / 2 - 1))
    else:
        x = L.conv2d(p["kps_score"], x, stride=1, padding=0)
    if cfg.KRCNN.UP_SCALE > 1:
        # Frozen bilinear interpolation (mynn.BilinearInterpolation2d):
        # depthwise transposed conv with the canonical FCN bilinear kernel.
        f = cfg.KRCNN.UP_SCALE
        nk = x.shape[-1]
        kern = finit.bilinear_upsample_kernel(f, nk, x.dtype)
        # Depthwise transposed conv expressed as an input-dilated conv (the
        # bilinear kernel is symmetric, so no spatial flip is needed).
        # torch padding p = ceil((f-1)/2) maps to k-1-p here.
        k = 2 * f - f % 2
        pad = k - 1 - (f - 1 + 1) // 2
        x = jax.lax.conv_general_dilated(
            x, kern,
            window_strides=(1, 1),
            padding=[(pad, pad), (pad, pad)],
            lhs_dilation=(f, f),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=nk,
        )
    return x
