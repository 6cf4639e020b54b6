"""Training sanity: the loss must fall when overfitting one tiny synthetic
batch (full pipeline: in-graph proposals, in-graph targets, all losses,
Caffe2-form SGD). Slow-ish on CPU, so the model is as small as the code
paths allow."""

import numpy as np
import jax
import jax.numpy as jnp

from detectron_tpu.core import config
from detectron_tpu.models import model_builder as mb
from detectron_tpu.parallel import optimizer as opt
from detectron_tpu.parallel import train_step as ts


def test_loss_decreases_on_fixed_batch():
    config.merge_cfg_from_list([
        "MODEL.CONV_BODY", "FPN.fpn_ResNet50_conv5_body",
        "MODEL.FASTER_RCNN", "True",
        "MODEL.NUM_CLASSES", "3",
        "FPN.FPN_ON", "True",
        "FPN.MULTILEVEL_ROIS", "True",
        "FPN.MULTILEVEL_RPN", "True",
        "FAST_RCNN.ROI_BOX_HEAD", "fast_rcnn_heads.roi_2mlp_head",
        "FAST_RCNN.ROI_XFORM_METHOD", "RoIAlign",
        "FAST_RCNN.ROI_XFORM_RESOLUTION", "7",
        "FAST_RCNN.ROI_XFORM_SAMPLING_RATIO", "2",
        "FAST_RCNN.MLP_HEAD_DIM", "32",
        "TRAIN.IMS_PER_BATCH", "1",
        "TRAIN.BATCH_SIZE_PER_IM", "16",
        "TRAIN.RPN_PRE_NMS_TOP_N", "64",
        "TRAIN.RPN_POST_NMS_TOP_N", "16",
        "TRAIN.RPN_BATCH_SIZE_PER_IM", "32",
        "RESNETS.FREEZE_AT", "4",  # train only res5/FPN/heads: faster on CPU
        "SOLVER.BASE_LR", "0.001",
        "SOLVER.WARM_UP_ITERS", "0",
        "SOLVER.LR_POLICY", "steps_with_decay",
        "SOLVER.STEPS", "[0]",
        "SOLVER.MAX_ITER", "100",
        "SOLVER.WEIGHT_DECAY", "0.0",
        "TPU.NMS_TILE_SIZE", "32",
        "TPU.MAX_GT_BOXES", "4",
        "TPU.ROI_IMPL", "windowed",
        "TPU.ROI_WINDOW", "16",
        "TPU.ROI_CHUNK", "16",
    ])
    config.assert_and_infer_cfg(make_immutable=False)

    rng = np.random.RandomState(0)
    size = 64
    images = rng.randn(1, size, size, 3).astype(np.float32)
    batch = {
        "images": jnp.asarray(images),
        "im_info": jnp.asarray([[size, size, 1.0]], jnp.float32),
        "gt_boxes": jnp.asarray(
            [[[8, 8, 40, 40], [30, 20, 60, 50],
              [0, 0, 0, 0], [0, 0, 0, 0]]], jnp.float32),
        "gt_classes": jnp.asarray([[1, 2, 0, 0]], jnp.int32),
        "gt_valid": jnp.asarray([[True, True, False, False]]),
        "crowd_boxes": jnp.zeros((1, 1, 4), jnp.float32),
        "crowd_valid": jnp.zeros((1, 1), bool),
    }

    params = mb.init_model(jax.random.PRNGKey(0))
    opt_state = opt.init_opt_state(params)
    step = jax.jit(ts.train_step)
    fixed_rng = jax.random.PRNGKey(7)

    losses = []
    for i in range(16):
        params, opt_state, stats = step(params, opt_state, batch, fixed_rng)
        losses.append(float(stats["loss"]))
    assert all(np.isfinite(losses)), losses
    first = np.mean(losses[:3])
    last = np.mean(losses[-3:])
    assert last < first * 0.8, (
        "loss did not decrease: first {:.4f} last {:.4f} ({})".format(
            first, last, ["%.3f" % l for l in losses]))
