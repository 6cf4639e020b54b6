"""The decisive end-to-end check: train MASK R-CNN FROM SCRATCH on a
synthetic detect-the-green-box dataset (GN body + gradient clipping — the
reference's scratch recipe), then evaluate boxes AND masks on held-out
images through the full inference + COCOeval stack. A working framework
reaches ~AP50 1.0 (box) and high mask AP50 in 240 steps; the assertions
leave wide margin. Runtime ~10 min on CPU."""

import json
import os
import time

import numpy as np
import pytest

from detectron_tpu.core import config
from detectron_tpu.core.config import cfg


def _make_dataset(base, rng):
    import cv2

    os.makedirs(base + "/coco/train2017", exist_ok=True)
    os.makedirs(base + "/coco/val2017", exist_ok=True)
    os.makedirs(base + "/coco/annotations", exist_ok=True)

    def split(n, name, start_id):
        images, annotations = [], []
        for i in range(n):
            h, w = 96, 128
            im = rng.randint(0, 40, (h, w, 3), np.uint8)
            x, y = rng.randint(5, 60), rng.randint(5, 40)
            bw, bh = rng.randint(25, 45), rng.randint(20, 35)
            im[y:y + bh, x:x + bw] = (30, 220, 30)
            img_id = start_id + i
            cv2.imwrite("{}/coco/{}/{:012d}.jpg".format(base, name, img_id),
                        im)
            images.append({"id": img_id, "width": w, "height": h,
                           "file_name": "{:012d}.jpg".format(img_id)})
            annotations.append({
                "id": img_id, "image_id": img_id, "category_id": 1,
                "bbox": [float(x), float(y), float(bw), float(bh)],
                "area": float(bw * bh), "iscrowd": 0,
                "segmentation": [[x, y, x + bw, y, x + bw, y + bh, x,
                                  y + bh]]})
        return images, annotations

    cats = [{"id": 1, "name": "greenbox", "supercategory": "x"}]
    tr = split(16, "train2017", 1)
    va = split(4, "val2017", 1000)
    json.dump({"images": tr[0], "annotations": tr[1], "categories": cats},
              open(base + "/coco/annotations/instances_train2017.json", "w"))
    json.dump({"images": va[0], "annotations": va[1], "categories": cats},
              open(base + "/coco/annotations/instances_val2017.json", "w"))


def test_train_from_scratch_reaches_ap(tmp_path):
    import jax
    import jax.numpy as jnp

    base = str(tmp_path)
    _make_dataset(base, np.random.RandomState(0))

    config.merge_cfg_from_list([
        "DATA_DIR", base,
        "MODEL.CONV_BODY", "FPN.fpn_ResNet50_conv5_body",
        "MODEL.FASTER_RCNN", "True",
        "MODEL.MASK_ON", "True",
        "MODEL.NUM_CLASSES", "2",
        "MRCNN.ROI_MASK_HEAD",
        "mask_rcnn_heads.mask_rcnn_fcn_head_v1up4convs_gn",
        "MRCNN.RESOLUTION", "14",
        "MRCNN.ROI_XFORM_METHOD", "RoIAlign",
        "MRCNN.ROI_XFORM_RESOLUTION", "7",
        "MRCNN.ROI_XFORM_SAMPLING_RATIO", "2",
        "MRCNN.DIM_REDUCED", "32",
        "FPN.FPN_ON", "True", "FPN.MULTILEVEL_ROIS", "True",
        "FPN.MULTILEVEL_RPN", "True", "FPN.USE_GN", "True",
        "RESNETS.USE_GN", "True", "RESNETS.FREEZE_AT", "0",
        "FAST_RCNN.ROI_BOX_HEAD", "fast_rcnn_heads.roi_2mlp_head",
        "FAST_RCNN.ROI_XFORM_METHOD", "RoIAlign",
        "FAST_RCNN.ROI_XFORM_RESOLUTION", "7",
        "FAST_RCNN.ROI_XFORM_SAMPLING_RATIO", "2",
        "FAST_RCNN.MLP_HEAD_DIM", "64",
        "TRAIN.SCALES", "(96,)", "TRAIN.MAX_SIZE", "128",
        "TRAIN.IMS_PER_BATCH", "2", "TRAIN.BATCH_SIZE_PER_IM", "32",
        "TRAIN.RPN_PRE_NMS_TOP_N", "128", "TRAIN.RPN_POST_NMS_TOP_N", "32",
        "TRAIN.RPN_BATCH_SIZE_PER_IM", "64",
        "TRAIN.DATASETS", "('coco_2017_train',)",
        "TEST.SCALE", "96", "TEST.MAX_SIZE", "128",
        "TEST.RPN_PRE_NMS_TOP_N", "128", "TEST.RPN_POST_NMS_TOP_N", "32",
        "TEST.DETECTIONS_PER_IM", "8", "TEST.SCORE_THRESH", "0.01",
        "TEST.NMS", "0.5",
        "SOLVER.BASE_LR", "0.005", "SOLVER.WARM_UP_ITERS", "30",
        "SOLVER.WARM_UP_FACTOR", "0.1",
        "SOLVER.CLIP_GRADIENTS", "10.0",
        "SOLVER.LR_POLICY", "steps_with_decay", "SOLVER.STEPS", "[0, 180]",
        "SOLVER.MAX_ITER", "240", "SOLVER.WEIGHT_DECAY", "0.0001",
        "TPU.NMS_TILE_SIZE", "32", "TPU.MAX_GT_BOXES", "4",
        "TPU.ROI_IMPL", "windowed", "TPU.ROI_WINDOW", "16",
        "TPU.ROI_CHUNK", "32",
    ])
    config.assert_and_infer_cfg(make_immutable=False)

    from detectron_tpu.core import test_engine
    from detectron_tpu.data import task_evaluation
    from detectron_tpu.data.json_dataset import JsonDataset
    from detectron_tpu.data.loader import TrainLoader
    from detectron_tpu.data.roidb import combined_roidb_for_training
    from detectron_tpu.models import model_builder as mb
    from detectron_tpu.parallel import optimizer as opt
    from detectron_tpu.parallel import train_step as ts

    roidb, _, _ = combined_roidb_for_training(cfg.TRAIN.DATASETS)
    params = mb.init_model(jax.random.PRNGKey(0))
    opt_state = opt.init_opt_state(params)
    step = jax.jit(ts.train_step, donate_argnums=(0, 1))
    loader = TrainLoader(roidb, 2, seed=0, num_threads=1)
    try:
        for i in range(240):
            batch = {k: jnp.asarray(v) for k, v in next(loader).items()}
            params, opt_state, stats = step(
                params, opt_state, batch,
                jax.random.fold_in(jax.random.PRNGKey(3), i))
    finally:
        loader.close()
    final_loss = float(np.asarray(stats["loss"]))
    assert np.isfinite(final_loss) and final_loss < 1.0, final_loss

    ds = JsonDataset("coco_2017_val")
    val_roidb = ds.get_roidb(gt=True)
    all_boxes, all_segms, _ = test_engine.test_net(
        params, val_roidb, ds, batch_size=2, output_dir=None)
    results = task_evaluation.evaluate_boxes(
        ds, all_boxes, str(tmp_path / "out"))
    ap50 = results["coco_2017_val"]["box"]["AP50"]
    # A working pipeline reaches 1.0; huge margin against seed flakiness.
    assert ap50 > 0.5, "AP50 after from-scratch training: {}".format(ap50)

    # Mask head learns too: the gt masks are full boxes, so predicted masks
    # should cover the detected boxes (mask AP50 tracks box AP50 closely).
    mask_results = task_evaluation.evaluate_masks(
        ds, all_boxes, all_segms, str(tmp_path / "out_masks"))
    mask_ap50 = mask_results["coco_2017_val"]["mask"]["AP50"]
    assert mask_ap50 > 0.5, \
        "mask AP50 after from-scratch training: {}".format(mask_ap50)
