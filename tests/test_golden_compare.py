"""Golden-tensor harness (tools/golden_compare.py): stage dump + diff.

This is the AP-parity readiness tooling — when real Detectron weights and
COCO images appear, the dump/diff localizes any divergence per stage. Here
we prove the harness end-to-end on synthetic weights: dumping runs, a
self-diff passes, and a perturbed-weights diff fails at the right stage.
"""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from detectron_tpu.core import config

REPO = Path(__file__).resolve().parents[1]


def _tiny_cfg():
    config.merge_cfg_from_list([
        "MODEL.CONV_BODY", "FPN.fpn_ResNet50_conv5_body",
        "MODEL.FASTER_RCNN", "True",
        "MODEL.MASK_ON", "True",
        "MODEL.NUM_CLASSES", "4",
        "FPN.FPN_ON", "True",
        "FPN.MULTILEVEL_ROIS", "True",
        "FPN.MULTILEVEL_RPN", "True",
        "FAST_RCNN.ROI_BOX_HEAD", "fast_rcnn_heads.roi_2mlp_head",
        "FAST_RCNN.ROI_XFORM_METHOD", "RoIAlign",
        "FAST_RCNN.ROI_XFORM_RESOLUTION", "7",
        "FAST_RCNN.ROI_XFORM_SAMPLING_RATIO", "2",
        "FAST_RCNN.MLP_HEAD_DIM", "32",
        "MRCNN.ROI_MASK_HEAD",
        "mask_rcnn_heads.mask_rcnn_fcn_head_v1up4convs",
        "MRCNN.RESOLUTION", "14",
        "MRCNN.ROI_XFORM_RESOLUTION", "7",
        "MRCNN.ROI_XFORM_SAMPLING_RATIO", "2",
        "TEST.SCALE", "96",
        "TEST.MAX_SIZE", "128",
        "TEST.RPN_PRE_NMS_TOP_N", "64",
        "TEST.RPN_POST_NMS_TOP_N", "16",
        "TEST.DETECTIONS_PER_IM", "8",
        "TEST.SCORE_THRESH", "0.0",
        "TPU.NMS_TILE_SIZE", "32",
        "TPU.ROI_IMPL", "windowed",
        "TPU.ROI_WINDOW", "16",
        "TPU.ROI_CHUNK", "16",
        "TPU.COMPUTE_DTYPE", "float32",
    ])
    config.assert_and_infer_cfg(make_immutable=False)


def _dump(params, tmp_path, name):
    sys.path.insert(0, str(REPO / "tools"))
    try:
        import golden_compare
    finally:
        sys.path.pop(0)
    rng = np.random.RandomState(7)
    im = (rng.rand(60, 80, 3) * 255).astype(np.uint8)
    stages = golden_compare.dump_stages(params, im)
    out = tmp_path / name
    np.savez_compressed(out, **stages)
    return out, stages


@pytest.fixture
def tiny_params():
    import jax

    from detectron_tpu.models import model_builder as mb

    _tiny_cfg()
    return mb.init_model(jax.random.PRNGKey(0))


def test_dump_stages_complete(tiny_params, tmp_path):
    _, stages = _dump(tiny_params, tmp_path, "a.npz")
    for key in ["data", "res2", "res5", "fpn_p2", "fpn_p6",
                "rpn_cls_logits_l0", "rpn_rois", "roi_feat",
                "box_head_feat", "cls_prob", "bbox_pred", "det_boxes",
                "det_scores", "det_mask_probs"]:
        assert key in stages, key
        assert np.isfinite(stages[key]).all(), key
    # probabilities are normalized per roi
    s = stages["cls_prob"].sum(-1)
    valid = stages["rpn_roi_valid"][..., 0] if stages[
        "rpn_roi_valid"].ndim == 3 else stages["rpn_roi_valid"]
    np.testing.assert_allclose(s[valid > 0], 1.0, atol=1e-4)


def test_self_diff_passes_and_perturbed_fails(tiny_params, tmp_path):
    sys.path.insert(0, str(REPO / "tools"))
    try:
        import golden_compare
    finally:
        sys.path.pop(0)

    a, _ = _dump(tiny_params, tmp_path, "a.npz")
    b, _ = _dump(tiny_params, tmp_path, "b.npz")
    assert golden_compare.diff_dumps(str(a), str(b), rtol=1e-5) == 0

    # perturb a deep-stage weight: early stages must still agree, the diff
    # must fail (localizing the divergence downstream of res5)
    import jax

    perturbed = jax.tree_util.tree_map(lambda x: x, tiny_params)
    w = np.asarray(perturbed["box_outs"]["cls_score"]["w"]).copy()
    # perturb ONE class column (a uniform shift of all logits would be
    # invisible to softmax)
    w[:, 1] += 0.5
    perturbed["box_outs"]["cls_score"]["w"] = w
    c, stages_c = _dump(perturbed, tmp_path, "c.npz")
    with np.load(a) as za:
        np.testing.assert_allclose(za["res5"], stages_c["res5"], atol=1e-5)
        np.testing.assert_allclose(za["rpn_rois"], stages_c["rpn_rois"],
                                   atol=1e-4)
        assert np.abs(za["cls_prob"] - stages_c["cls_prob"]).max() > 1e-3
    assert golden_compare.diff_dumps(str(a), str(c), rtol=1e-5) == 1


def test_nchw_auto_transpose(tmp_path):
    sys.path.insert(0, str(REPO / "tools"))
    try:
        import golden_compare
    finally:
        sys.path.pop(0)
    x = np.random.RandomState(0).rand(1, 8, 10, 3).astype(np.float32)
    np.savez(tmp_path / "nhwc.npz", t=x)
    np.savez(tmp_path / "nchw.npz", t=np.transpose(x, (0, 3, 1, 2)))
    assert golden_compare.diff_dumps(
        str(tmp_path / "nhwc.npz"), str(tmp_path / "nchw.npz"),
        rtol=1e-6) == 0
