import textwrap

import numpy as np
import pytest

from detectron_tpu.core import config
from detectron_tpu.core.config import cfg


def test_defaults_present():
    assert cfg.TRAIN.IMS_PER_BATCH == 2
    assert cfg.TEST.NMS == 0.3
    assert cfg.MODEL.BBOX_REG_WEIGHTS == (10.0, 10.0, 5.0, 5.0)
    assert np.isclose(cfg.BBOX_XFORM_CLIP, np.log(1000.0 / 16.0))
    assert cfg.FPN.ROI_CANONICAL_SCALE == 224


def test_merge_reference_style_yaml(tmp_path):
    # A trimmed e2e_mask_rcnn_R-50-FPN_1x.yaml in the reference's format.
    y = textwrap.dedent(
        """
        MODEL:
          TYPE: generalized_rcnn
          CONV_BODY: FPN.fpn_ResNet50_conv5_body
          FASTER_RCNN: True
          MASK_ON: True
          NUM_CLASSES: 81
        NUM_GPUS: 8
        SOLVER:
          WEIGHT_DECAY: 0.0001
          LR_POLICY: steps_with_decay
          BASE_LR: 0.02
          GAMMA: 0.1
          MAX_ITER: 90000
          STEPS: [0, 60000, 80000]
        FPN:
          FPN_ON: True
          MULTILEVEL_ROIS: True
          MULTILEVEL_RPN: True
        RESNETS:
          IMAGENET_PRETRAINED_WEIGHTS: 'data/pretrained_model/R-50.pkl'
        FAST_RCNN:
          ROI_BOX_HEAD: fast_rcnn_heads.roi_2mlp_head
          ROI_XFORM_METHOD: RoIAlign
          ROI_XFORM_RESOLUTION: 7
          ROI_XFORM_SAMPLING_RATIO: 2
        MRCNN:
          ROI_MASK_HEAD: mask_rcnn_heads.mask_rcnn_fcn_head_v1up4convs
          RESOLUTION: 28
          ROI_XFORM_METHOD: RoIAlign
          ROI_XFORM_RESOLUTION: 14
          ROI_XFORM_SAMPLING_RATIO: 2
          DILATION: 1
          CONV_INIT: MSRAFill
        TRAIN:
          SCALES: (800,)
          MAX_SIZE: 1333
          BATCH_SIZE_PER_IM: 512
          RPN_PRE_NMS_TOP_N: 2000
        TEST:
          SCALE: 800
          MAX_SIZE: 1333
          NMS: 0.5
          RPN_PRE_NMS_TOP_N: 1000
          RPN_POST_NMS_TOP_N: 1000
        OUTPUT_DIR: .
        """
    )
    p = tmp_path / "cfg.yaml"
    p.write_text(y)
    config.merge_cfg_from_file(str(p))
    assert cfg.MODEL.MASK_ON is True
    assert cfg.MODEL.NUM_CLASSES == 81
    assert cfg.SOLVER.STEPS == (0, 60000, 80000)
    assert cfg.TRAIN.SCALES == (800,)  # str '(800,)' coerced to tuple
    assert cfg.FAST_RCNN.ROI_XFORM_SAMPLING_RATIO == 2
    assert cfg.SOLVER.BASE_LR == 0.02

    config.assert_and_infer_cfg()
    assert cfg.RPN.RPN_ON is True  # inferred from FASTER_RCNN
    assert cfg.TPU.TEST_ROIS_PER_IM == 1000
    with pytest.raises(AttributeError):
        cfg.TEST.NMS = 0.7  # immutable now


def test_merge_from_list():
    config.merge_cfg_from_list(["TEST.NMS", "0.42", "MODEL.NUM_CLASSES", "3"])
    assert cfg.TEST.NMS == 0.42
    assert cfg.MODEL.NUM_CLASSES == 3


def test_nonexistent_key_raises(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("NOT_A_KEY: 1\n")
    with pytest.raises(KeyError):
        config.merge_cfg_from_file(str(p))


def test_deprecated_key_ignored(tmp_path):
    p = tmp_path / "dep.yaml"
    p.write_text("USE_GPU_NMS: True\nTEST:\n  NMS: 0.4\n")
    config.merge_cfg_from_file(str(p))
    assert cfg.TEST.NMS == 0.4
