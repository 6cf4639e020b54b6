"""Keypoint R-CNN paths: head shapes, training step, detection graph, and
the heatmap decode round trip."""

import numpy as np
import jax
import jax.numpy as jnp

from detectron_tpu.core import config
from detectron_tpu.core.config import cfg


def _kps_cfg():
    config.merge_cfg_from_list([
        "MODEL.CONV_BODY", "FPN.fpn_ResNet50_conv5_body",
        "MODEL.FASTER_RCNN", "True",
        "MODEL.KEYPOINTS_ON", "True",
        "MODEL.NUM_CLASSES", "2",
        "FPN.FPN_ON", "True",
        "FPN.MULTILEVEL_ROIS", "True",
        "FPN.MULTILEVEL_RPN", "True",
        "FAST_RCNN.ROI_BOX_HEAD", "fast_rcnn_heads.roi_2mlp_head",
        "FAST_RCNN.ROI_XFORM_METHOD", "RoIAlign",
        "FAST_RCNN.ROI_XFORM_RESOLUTION", "7",
        "FAST_RCNN.ROI_XFORM_SAMPLING_RATIO", "2",
        "FAST_RCNN.MLP_HEAD_DIM", "32",
        "KRCNN.ROI_KEYPOINTS_HEAD", "keypoint_rcnn_heads.roi_pose_head_v1convX",
        "KRCNN.NUM_STACKED_CONVS", "2",
        "KRCNN.CONV_HEAD_DIM", "32",
        "KRCNN.NUM_KEYPOINTS", "17",
        "KRCNN.USE_DECONV_OUTPUT", "True",
        "KRCNN.UP_SCALE", "2",
        "KRCNN.HEATMAP_SIZE", "28",
        "KRCNN.ROI_XFORM_METHOD", "RoIAlign",
        "KRCNN.ROI_XFORM_RESOLUTION", "7",
        "KRCNN.ROI_XFORM_SAMPLING_RATIO", "2",
        "TRAIN.IMS_PER_BATCH", "1",
        "TRAIN.BATCH_SIZE_PER_IM", "16",
        "TRAIN.RPN_PRE_NMS_TOP_N", "64",
        "TRAIN.RPN_POST_NMS_TOP_N", "16",
        "TRAIN.RPN_BATCH_SIZE_PER_IM", "32",
        "TEST.RPN_PRE_NMS_TOP_N", "64",
        "TEST.RPN_POST_NMS_TOP_N", "16",
        "TEST.DETECTIONS_PER_IM", "4",
        "TEST.SCORE_THRESH", "0.0",
        "TPU.NMS_TILE_SIZE", "32",
        "TPU.MAX_GT_BOXES", "4",
        "TPU.ROI_IMPL", "windowed",
        "TPU.ROI_WINDOW", "16",
        "TPU.ROI_CHUNK", "16",
    ])
    config.assert_and_infer_cfg(make_immutable=False)


def test_keypoint_head_shapes():
    _kps_cfg()
    from detectron_tpu.models import keypoint_rcnn_heads as kh

    p_head = kh.init_pose_head(jax.random.PRNGKey(0), 256)
    p_out = kh.init_keypoint_outputs(jax.random.PRNGKey(1), 32)
    x = jnp.zeros((3, 7, 7, 256))
    h = kh.apply_pose_head(p_head, x)
    assert h.shape == (3, 7, 7, 32)
    hm = kh.apply_keypoint_outputs(p_out, h)
    # 7 -> deconv-out 14 -> bilinear x2 -> 28 == HEATMAP_SIZE
    assert hm.shape == (3, 28, 28, 17)


def test_keypoint_train_step():
    _kps_cfg()
    from detectron_tpu.models import model_builder as mb
    from detectron_tpu.parallel import optimizer as opt
    from detectron_tpu.parallel import train_step as ts

    params = mb.init_model(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    kps = np.zeros((1, 4, 17, 3), np.float32)
    kps[0, 0, :, 0] = np.linspace(10, 38, 17)
    kps[0, 0, :, 1] = np.linspace(10, 38, 17)
    kps[0, 0, :, 2] = 2
    batch = {
        "images": jnp.asarray(rng.randn(1, 64, 64, 3), jnp.float32),
        "im_info": jnp.asarray([[64, 64, 1.0]], jnp.float32),
        "gt_boxes": jnp.asarray([[[8, 8, 40, 40], [0, 0, 0, 0],
                                  [0, 0, 0, 0], [0, 0, 0, 0]]], jnp.float32),
        "gt_classes": jnp.asarray([[1, 0, 0, 0]], jnp.int32),
        "gt_valid": jnp.asarray([[True, False, False, False]]),
        "crowd_boxes": jnp.zeros((1, 1, 4), jnp.float32),
        "crowd_valid": jnp.zeros((1, 1), bool),
        "gt_keypoints": jnp.asarray(kps),
    }
    opt_state = opt.init_opt_state(params)
    _, _, stats = jax.jit(ts.train_step)(params, opt_state, batch,
                                         jax.random.PRNGKey(1))
    assert "loss_kps" in stats
    assert np.isfinite(float(stats["loss_kps"]))


def test_keypoint_detect_graph():
    _kps_cfg()
    from detectron_tpu.core import test as test_ops
    from detectron_tpu.models import model_builder as mb

    params = mb.init_model(jax.random.PRNGKey(0))
    images = jnp.asarray(
        np.random.RandomState(0).randn(1, 64, 64, 3), jnp.float32)
    info = jnp.asarray([[64, 64, 1.0]], jnp.float32)
    out = jax.jit(test_ops.detect_graph)(params, images, info)
    assert out["kps_heatmaps"].shape == (1, 4, 28, 28, 17)


def test_heatmaps_to_keypoints_roundtrip():
    _kps_cfg()
    from detectron_tpu.utils import keypoints as kp_utils

    rois = np.array([[10.0, 20.0, 66.0, 76.0]])
    maps = np.zeros((1, 17, 28, 28), np.float32)
    # put the peak for kp 0 at heatmap cell (7, 14) -> image coords
    maps[0, 0, 7, 14] = 10.0
    xy = kp_utils.heatmaps_to_keypoints(maps, rois)
    x, y = xy[0, 0, 0], xy[0, 1, 0]
    # cell 14 of 28 over width 56 -> x ~ 10 + 29; cell 7 -> y ~ 20 + 15
    assert abs(x - (10 + 56 * (14.5 / 28))) < 2.5
    assert abs(y - (20 + 56 * (7.5 / 28))) < 2.5
