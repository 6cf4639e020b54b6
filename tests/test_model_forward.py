import numpy as np
import jax
import jax.numpy as jnp
import pytest

from detectron_tpu.core import config
from detectron_tpu.core.config import cfg
from detectron_tpu.models import model_builder as mb


def _tiny_fpn_cfg():
    config.merge_cfg_from_list([
        "MODEL.CONV_BODY", "FPN.fpn_ResNet50_conv5_body",
        "MODEL.FASTER_RCNN", "True",
        "MODEL.NUM_CLASSES", "4",
        "FPN.FPN_ON", "True",
        "FPN.MULTILEVEL_ROIS", "True",
        "FPN.MULTILEVEL_RPN", "True",
        "FAST_RCNN.ROI_BOX_HEAD", "fast_rcnn_heads.roi_2mlp_head",
        "FAST_RCNN.ROI_XFORM_METHOD", "RoIAlign",
        "FAST_RCNN.ROI_XFORM_RESOLUTION", "7",
        "FAST_RCNN.ROI_XFORM_SAMPLING_RATIO", "2",
        "FAST_RCNN.MLP_HEAD_DIM", "64",
        "TEST.RPN_PRE_NMS_TOP_N", "64",
        "TEST.RPN_POST_NMS_TOP_N", "16",
        "TPU.NMS_TILE_SIZE", "32",
    ])
    config.assert_and_infer_cfg(make_immutable=False)


def _tiny_c4_cfg():
    config.merge_cfg_from_list([
        "MODEL.CONV_BODY", "ResNet.ResNet50_conv4_body",
        "MODEL.FASTER_RCNN", "True",
        "MODEL.NUM_CLASSES", "4",
        "FAST_RCNN.ROI_BOX_HEAD", "ResNet.ResNet_roi_conv5_head",
        "FAST_RCNN.ROI_XFORM_METHOD", "RoIAlign",
        "FAST_RCNN.ROI_XFORM_RESOLUTION", "14",
        "FAST_RCNN.ROI_XFORM_SAMPLING_RATIO", "0",
        "TEST.RPN_PRE_NMS_TOP_N", "64",
        "TEST.RPN_POST_NMS_TOP_N", "8",
        "TPU.NMS_TILE_SIZE", "32",
    ])
    config.assert_and_infer_cfg(make_immutable=False)


def _run_inference_stack(batch=1, size=64):
    params = mb.init_model(jax.random.PRNGKey(0))
    images = jnp.asarray(
        np.random.RandomState(0).randn(batch, size, size, 3), jnp.float32)
    im_info = jnp.asarray([[size, size, 1.0]] * batch, jnp.float32)

    feats, scales = mb.forward_features(params, images)
    rpn_outs = mb.forward_rpn(params, feats)
    rois, scores, valid = mb.generate_proposals(
        rpn_outs, feats, im_info, training=False)
    cls_logits, bbox_pred, _ = mb.forward_box_outputs(
        params, feats, scales, rois)
    return feats, rois, valid, cls_logits, bbox_pred


def test_fpn_inference_shapes():
    _tiny_fpn_cfg()
    feats, rois, valid, cls_logits, bbox_pred = _run_inference_stack()
    assert len(feats) == 5  # P2..P6
    assert rois.shape == (1, 16, 4)
    assert cls_logits.shape == (1, 16, 4)
    assert bbox_pred.shape == (1, 16, 16)
    assert np.isfinite(np.asarray(cls_logits)).all()
    # Valid proposals have x2>=x1, y2>=y1 within image
    r = np.asarray(rois)[np.asarray(valid)]
    assert (r[:, 2] >= r[:, 0]).all() and (r[:, 3] >= r[:, 1]).all()


def test_c4_inference_shapes():
    _tiny_c4_cfg()
    feats, rois, valid, cls_logits, bbox_pred = _run_inference_stack()
    assert len(feats) == 1
    assert feats[0].shape[-1] == 1024
    assert rois.shape == (1, 8, 4)
    assert cls_logits.shape == (1, 8, 4)
    assert np.isfinite(np.asarray(cls_logits)).all()


def test_fpn_body_feature_strides():
    _tiny_fpn_cfg()
    params = mb.init_model(jax.random.PRNGKey(1))
    images = jnp.zeros((1, 64, 64, 3), jnp.float32)
    feats, scales = mb.forward_features(params, images)
    assert [f.shape[1] for f in feats] == [16, 8, 4, 2, 1]
    assert scales == [0.25, 0.125, 0.0625, 0.03125, 0.015625]


def test_c4_mask_rcnn_v0upshare_train_step():
    """C4 Mask R-CNN with the res5-sharing mask head (v0upshare)."""
    import jax
    from detectron_tpu.parallel import optimizer as opt
    from detectron_tpu.parallel import train_step as ts

    _tiny_c4_cfg()
    config.merge_cfg_from_list([
        "MODEL.MASK_ON", "True",
        "MRCNN.ROI_MASK_HEAD", "mask_rcnn_heads.mask_rcnn_fcn_head_v0upshare",
        "MRCNN.RESOLUTION", "14",
        "MRCNN.ROI_XFORM_METHOD", "RoIAlign",
        "MRCNN.ROI_XFORM_RESOLUTION", "14",
        "MRCNN.ROI_XFORM_SAMPLING_RATIO", "0",
        "MRCNN.DILATION", "1",
        "TRAIN.IMS_PER_BATCH", "1",
        "TRAIN.BATCH_SIZE_PER_IM", "16",
        "TRAIN.RPN_PRE_NMS_TOP_N", "64",
        "TRAIN.RPN_POST_NMS_TOP_N", "8",
        "TRAIN.RPN_BATCH_SIZE_PER_IM", "32",
        "TPU.MAX_GT_BOXES", "4",
        "TPU.GT_MASK_SIZE", "28",
        "TPU.ROI_CHUNK", "8",
    ])
    config.assert_and_infer_cfg(make_immutable=False)
    params = mb.init_model(jax.random.PRNGKey(0))
    assert "mask_head" in params and "res5" not in params["mask_head"]

    masks = np.zeros((1, 4, 28, 28), np.float32)
    masks[:, :, 5:20, 5:20] = 1.0
    batch = {
        "images": jnp.asarray(
            np.random.RandomState(0).randn(1, 64, 64, 3), jnp.float32),
        "im_info": jnp.asarray([[64, 64, 1.0]], jnp.float32),
        "gt_boxes": jnp.asarray([[[8, 8, 40, 40], [0, 0, 0, 0],
                                  [0, 0, 0, 0], [0, 0, 0, 0]]], jnp.float32),
        "gt_classes": jnp.asarray([[1, 0, 0, 0]], jnp.int32),
        "gt_valid": jnp.asarray([[True, False, False, False]]),
        "crowd_boxes": jnp.zeros((1, 1, 4), jnp.float32),
        "crowd_valid": jnp.zeros((1, 1), bool),
        "gt_masks": jnp.asarray(masks),
    }
    opt_state = opt.init_opt_state(params)
    _, _, stats = jax.jit(ts.train_step)(params, opt_state, batch,
                                         jax.random.PRNGKey(1))
    assert "loss_mask" in stats
    assert np.isfinite(float(stats["loss_mask"]))


def test_roicrop_dispatch_fpn():
    """ROI_XFORM_METHOD RoICrop is dispatchable at the model level (FPN:
    per-level crop + level select), incl. CROP_RESIZE_WITH_MAX_POOL.
    Reference: lib/modeling/model_builder.py :: roi_feature_transform
    RoICrop branch."""
    _tiny_fpn_cfg()
    config.merge_cfg_from_list([
        "FAST_RCNN.ROI_XFORM_METHOD", "RoICrop",
        "CROP_RESIZE_WITH_MAX_POOL", "True",
    ])
    try:
        feats, rois, valid, cls_logits, bbox_pred = _run_inference_stack()
        assert cls_logits.shape == (1, 16, 4)
        assert np.isfinite(np.asarray(cls_logits)).all()
    finally:
        config.merge_cfg_from_list([
            "FAST_RCNN.ROI_XFORM_METHOD", "RoIAlign",
            "CROP_RESIZE_WITH_MAX_POOL", "False",
        ])


def test_roicrop_dispatch_c4():
    """RoICrop on the single-level C4 path, without the 2x max-pool."""
    _tiny_c4_cfg()
    config.merge_cfg_from_list([
        "FAST_RCNN.ROI_XFORM_METHOD", "RoICrop",
        "CROP_RESIZE_WITH_MAX_POOL", "False",
    ])
    try:
        feats, rois, valid, cls_logits, bbox_pred = _run_inference_stack()
        assert cls_logits.shape == (1, 8, 4)
        assert np.isfinite(np.asarray(cls_logits)).all()
    finally:
        config.merge_cfg_from_list([
            "FAST_RCNN.ROI_XFORM_METHOD", "RoIAlign"])


def test_s2d_stem_conv_exact():
    """cfg.TPU.S2D_STEM's blocked stem conv is mathematically identical to
    the 7x7/s2/p3 conv (models/resnet.py :: _s2d_stem_conv)."""
    import jax.numpy as jnp

    from detectron_tpu.core import config
    from detectron_tpu.models import layers as L
    from detectron_tpu.models import resnet

    config.assert_and_infer_cfg(make_immutable=False)
    rng = np.random.RandomState(0)
    p = {"w": jnp.asarray(rng.randn(7, 7, 3, 64).astype(np.float32) * 0.1),
         "b": jnp.asarray(rng.randn(64).astype(np.float32))}
    x = jnp.asarray(rng.randn(2, 64, 96, 3).astype(np.float32))
    ref = L.conv2d(p, x, stride=2, padding=3)
    got = resnet._s2d_stem_conv(p, x)
    assert ref.shape == got.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_s2d_input_stem_parity():
    """cfg.TPU.S2D_INPUT: host-blocked images through the 4x4 VALID stem
    must reproduce the direct 7x7/s2 stem bit-close (f32), end-to-end
    through the body+FPN features."""
    from detectron_tpu.utils import blob as blob_utils

    _tiny_fpn_cfg()
    params = mb.init_model(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    images = rng.randn(2, 64, 96, 3).astype(np.float32) * 20.0

    feats_ref, scales_ref = jax.jit(mb.forward_features)(
        params, jnp.asarray(images))

    config.merge_cfg_from_list(["TPU.S2D_INPUT", "True"])
    try:
        blocked = blob_utils.space_to_depth(images)
        assert blocked.shape == (2, 36, 52, 12)
        feats_s2d, scales_s2d = jax.jit(mb.forward_features)(
            params, jnp.asarray(blocked))
    finally:
        config.merge_cfg_from_list(["TPU.S2D_INPUT", "False"])

    assert scales_ref == scales_s2d
    # Identical math up to f32 accumulation order (different contraction
    # grouping): tiny absolute noise on O(100) activations.
    for a, b in zip(feats_ref, feats_s2d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=5e-3)
