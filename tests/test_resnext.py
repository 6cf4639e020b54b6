"""ResNeXt / X-152 model family: grouped-conv bodies build and run."""

import numpy as np
import jax
import jax.numpy as jnp

from detectron_tpu.core import config
from detectron_tpu.core.config import cfg
from detectron_tpu.models import model_builder as mb
from detectron_tpu.models import resnet


def test_resnext_stage_grouped_conv_shapes():
    config.merge_cfg_from_list([
        "RESNETS.NUM_GROUPS", "32",
        "RESNETS.WIDTH_PER_GROUP", "8",
        "RESNETS.STRIDE_1X1", "False",
    ])
    blocks = resnet.init_stage(jax.random.PRNGKey(0), 2, 64, 256, 256,
                               groups=32)
    x = jnp.zeros((1, 16, 16, 64))
    y = resnet.apply_stage(blocks, x, stride=1, groups=32)
    assert y.shape == (1, 16, 16, 256)
    # grouped 3x3: in_c/groups = 256/32 = 8
    assert blocks[0]["branch2b"]["w"].shape == (3, 3, 8, 256)


def test_x152_body_builds_and_runs_tiny():
    config.merge_cfg_from_list([
        "MODEL.CONV_BODY", "FPN.fpn_ResNet152_conv5_body",
        "MODEL.FASTER_RCNN", "True",
        "MODEL.NUM_CLASSES", "3",
        "FPN.FPN_ON", "True",
        "FPN.MULTILEVEL_RPN", "True",
        "FPN.MULTILEVEL_ROIS", "True",
        "RESNETS.NUM_GROUPS", "32",
        "RESNETS.WIDTH_PER_GROUP", "8",
        "RESNETS.STRIDE_1X1", "False",
        "FAST_RCNN.ROI_BOX_HEAD", "fast_rcnn_heads.roi_2mlp_head",
        "FAST_RCNN.ROI_XFORM_RESOLUTION", "7",
        "FAST_RCNN.ROI_XFORM_SAMPLING_RATIO", "2",
        "FAST_RCNN.MLP_HEAD_DIM", "32",
    ])
    config.assert_and_infer_cfg(make_immutable=False)
    spec = mb.build_spec()
    assert spec.depth == 152
    params = mb.init_model(jax.random.PRNGKey(0))
    # X-152: res3 has 8 blocks, res4 has 36
    assert len(params["body"]["res3"]) == 8
    assert len(params["body"]["res4"]) == 36
    # ResNeXt 32x8d dims: res2 inner = 256 grouped by 32 -> 8 in-ch kernels
    assert params["body"]["res2"][0]["branch2b"]["w"].shape == (3, 3, 8, 256)

    feats, scales = mb.forward_features(
        params, jnp.zeros((1, 64, 64, 3), jnp.float32))
    assert len(feats) == 5
    assert feats[0].shape == (1, 16, 16, 256)
    assert np.isfinite(np.asarray(feats[0])).all()
