"""The tools/ CLI surface end-to-end: train_net_step (3 steps, checkpoint),
test_net (eval + detections.pkl), infer_simple (visualization files) — all on
a synthetic on-disk dataset via subprocesses, as a user would run them."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_YAML = """
MODEL:
  TYPE: generalized_rcnn
  CONV_BODY: FPN.fpn_ResNet50_conv5_body
  FASTER_RCNN: True
  NUM_CLASSES: 4
NUM_GPUS: 1
SOLVER:
  WEIGHT_DECAY: 0.0001
  LR_POLICY: steps_with_decay
  BASE_LR: 0.001
  GAMMA: 0.1
  MAX_ITER: 3
  STEPS: [0]
  WARM_UP_ITERS: 0
FPN:
  FPN_ON: True
  MULTILEVEL_ROIS: True
  MULTILEVEL_RPN: True
FAST_RCNN:
  ROI_BOX_HEAD: fast_rcnn_heads.roi_2mlp_head
  ROI_XFORM_METHOD: RoIAlign
  ROI_XFORM_RESOLUTION: 7
  ROI_XFORM_SAMPLING_RATIO: 2
  MLP_HEAD_DIM: 32
TRAIN:
  SCALES: (96,)
  MAX_SIZE: 128
  IMS_PER_BATCH: 1
  BATCH_SIZE_PER_IM: 16
  RPN_PRE_NMS_TOP_N: 64
  RPN_POST_NMS_TOP_N: 16
  RPN_BATCH_SIZE_PER_IM: 32
  DATASETS: ('coco_2017_val',)
TEST:
  SCALE: 96
  MAX_SIZE: 128
  NMS: 0.5
  RPN_PRE_NMS_TOP_N: 64
  RPN_POST_NMS_TOP_N: 16
  DETECTIONS_PER_IM: 8
  SCORE_THRESH: 0.0
  DATASETS: ('coco_2017_val',)
TPU:
  NMS_TILE_SIZE: 32
  ROI_IMPL: windowed
  ROI_WINDOW: 16
  ROI_CHUNK: 16
  MAX_GT_BOXES: 4
OUTPUT_DIR: {out}
DATA_DIR: {data}
"""


@pytest.fixture(scope="module")
def cli_env(tmp_path_factory):
    import cv2

    tmp_path = tmp_path_factory.mktemp("cli")
    img_dir = tmp_path / "coco" / "val2017"
    ann_dir = tmp_path / "coco" / "annotations"
    img_dir.mkdir(parents=True)
    ann_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    images, annotations = [], []
    for i in range(3):
        h, w = 96, 128
        cv2.imwrite(str(img_dir / "{:012d}.jpg".format(i + 1)),
                    rng.randint(0, 255, (h, w, 3), np.uint8))
        images.append({"id": i + 1, "width": w, "height": h,
                       "file_name": "{:012d}.jpg".format(i + 1)})
        annotations.append({
            "id": i + 1, "image_id": i + 1, "category_id": 1,
            "bbox": [10.0, 10.0, 40.0, 30.0], "area": 1200.0, "iscrowd": 0,
            "segmentation": [[10, 10, 50, 10, 50, 40, 10, 40]],
        })
    gt = {"images": images, "annotations": annotations,
          "categories": [{"id": k, "name": n, "supercategory": "x"}
                         for k, n in ((1, "a"), (2, "b"), (3, "c"))]}
    (ann_dir / "instances_val2017.json").write_text(json.dumps(gt))

    out_dir = tmp_path / "Outputs"
    cfg_file = tmp_path / "tiny.yaml"
    cfg_file.write_text(TINY_YAML.format(out=str(out_dir), data=str(tmp_path)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    return {"tmp": tmp_path, "cfg": str(cfg_file), "env": env,
            "out": str(out_dir)}


def _run(args, env, timeout=900):
    proc = subprocess.run(
        [sys.executable] + args, cwd=os.path.join(REPO, "tools"),
        env=env, capture_output=True, text=True, timeout=timeout)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    return proc


def test_train_net_step_cli(cli_env):
    _run(["train_net_step.py", "--cfg", cli_env["cfg"], "--bs", "1",
          "--nw", "1", "--no_save"], cli_env["env"])


def test_train_net_epoch_cli(cli_env):
    """The legacy epoch trainer (reference tools/train_net.py): one epoch
    over the tiny dataset, per-epoch checkpoint under the reference's
    model_epoch{N} naming, epoch-derived lr schedule."""
    proc = _run(["train_net.py", "--cfg", cli_env["cfg"], "--bs", "1",
                 "--nw", "1", "--epochs", "1", "--lr", "0.0005",
                 "--lr_decay_epochs", "4", "5",
                 "--disp_interval", "1"], cli_env["env"])
    assert "epoch 1/1" in proc.stdout + proc.stderr
    import glob
    ck = glob.glob(os.path.join(cli_env["out"], "tiny", "ckpt",
                                "model_epoch1"))
    assert ck, "per-epoch checkpoint missing"


def test_train_net_step_cli_iter_size(cli_env):
    """--iter_size 2 must run the accumulating step (one update per 2
    minibatches). MAX_ITER=3 is linearly rescaled to 1 update; the run must
    complete, proving the accum wiring compiles and consumes 2 batches.
    Numeric equivalence of accumulation itself is locked by
    tests/test_train_step.py::test_grad_accumulation_matches_big_batch_direction."""
    proc = _run(["train_net_step.py", "--cfg", cli_env["cfg"], "--bs", "1",
                 "--nw", "1", "--iter_size", "2", "--no_save"],
                cli_env["env"])
    # Linear-scaling log proves iter_size entered the LR re-derivation.
    assert "Linear scaling" in proc.stdout + proc.stderr


def test_test_net_cli(cli_env):
    out = os.path.join(cli_env["out"], "eval")
    _run(["test_net.py", "--cfg", cli_env["cfg"], "--output_dir", out,
          "--batch_size", "2"], cli_env["env"])
    assert os.path.exists(os.path.join(out, "detections.pkl"))
    assert os.path.exists(
        os.path.join(out, "bbox_coco_2017_val_results.json"))


def test_infer_simple_cli(cli_env):
    out = os.path.join(str(cli_env["tmp"]), "vis")
    _run(["infer_simple.py", "--cfg", cli_env["cfg"],
          "--image_dir", os.path.join(str(cli_env["tmp"]), "coco",
                                      "val2017"),
          "--output_dir", out, "--thresh", "0.0", "--ext", "png"],
         cli_env["env"])
    assert os.path.isdir(out)
