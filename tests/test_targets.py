"""In-graph target assignment semantics (models/targets.py) against
hand-derived expectations."""

import numpy as np
import jax
import jax.numpy as jnp

from detectron_tpu.core import config
from detectron_tpu.core.config import cfg
from detectron_tpu.models import targets as T


def test_rpn_targets_basic():
    config.merge_cfg_from_list([
        "TRAIN.RPN_BATCH_SIZE_PER_IM", "8",
        "TRAIN.RPN_FG_FRACTION", "0.5",
    ])
    # 4 anchors: one perfectly on the gt, one with IoU ~0.55 (neither pos nor
    # neg), one clearly off (neg), one straddling the boundary (excluded).
    anchors = jnp.asarray(np.array([
        [10, 10, 29, 29],
        [15, 13, 34, 32],
        [60, 60, 79, 79],
        [-10, -10, 9, 9],
    ], np.float32))
    gt = jnp.asarray(np.array([[10, 10, 29, 29]], np.float32))
    gt_valid = jnp.asarray([True])
    im_hw = jnp.asarray([100.0, 100.0])
    out = T.rpn_targets_one_image(anchors, gt, gt_valid, im_hw,
                                  jax.random.PRNGKey(0))
    labels = np.asarray(out["labels"])
    assert labels[0] == 1          # IoU 1.0 -> positive
    assert labels[2] == 0          # IoU 0 -> negative
    assert labels[3] == -1         # outside image (straddle 0) -> excluded
    # bbox target for the perfect anchor is ~zero
    np.testing.assert_allclose(
        np.asarray(out["bbox_targets"])[0], np.zeros(4), atol=1e-5)


def test_rpn_fg_subsampling_cap():
    config.merge_cfg_from_list([
        "TRAIN.RPN_BATCH_SIZE_PER_IM", "4",
        "TRAIN.RPN_FG_FRACTION", "0.5",
    ])
    # 10 identical perfect anchors -> all positive candidates; cap = 2 fg.
    anchors = jnp.asarray(np.tile([[10, 10, 29, 29]], (10, 1)).astype(
        np.float32))
    gt = jnp.asarray(np.array([[10, 10, 29, 29]], np.float32))
    out = T.rpn_targets_one_image(
        anchors, gt, jnp.asarray([True]), jnp.asarray([100.0, 100.0]),
        jax.random.PRNGKey(1))
    labels = np.asarray(out["labels"])
    assert (labels == 1).sum() == 2
    assert (labels == 0).sum() == 0  # no negatives available


def test_sample_rois_composition():
    config.merge_cfg_from_list([
        "TRAIN.BATCH_SIZE_PER_IM", "8",
        "TRAIN.FG_FRACTION", "0.25",
        "MODEL.BBOX_REG_WEIGHTS", "(10., 10., 5., 5.)",
    ])
    rng = np.random.RandomState(0)
    # proposals: 4 on the gt (fg), 12 far away (bg)
    fg_props = np.tile([[10, 10, 29, 29]], (4, 1)) + rng.uniform(
        -2, 2, (4, 4))
    bg_props = rng.uniform(60, 90, (12, 4))
    bg_props[:, 2:] = bg_props[:, :2] + 10
    proposals = jnp.asarray(
        np.vstack([fg_props, bg_props]).astype(np.float32))
    prop_valid = jnp.ones(16, bool)
    gt = jnp.asarray(np.array([[10, 10, 29, 29]], np.float32))
    out = T.sample_rois_one_image(
        proposals, prop_valid, gt, jnp.asarray([3], jnp.int32),
        jnp.asarray([True]), jnp.zeros((1, 4)), jnp.asarray([False]),
        jax.random.PRNGKey(2))
    labels = np.asarray(out["labels"])
    fg = np.asarray(out["fg"])
    valid = np.asarray(out["valid"])
    # fg cap = 2 (0.25 * 8); at least the gt box itself and nearby props
    assert fg.sum() == 2
    assert valid.sum() == 8
    # fg entries come first and carry the gt class
    assert fg[:2].all() and not fg[2:].any()
    assert (labels[:2] == 3).all()
    assert (labels[2:][valid[2:]] == 0).all()


def test_sample_rois_crowd_exclusion():
    config.merge_cfg_from_list([
        "TRAIN.BATCH_SIZE_PER_IM", "8",
        "TRAIN.FG_FRACTION", "0.25",
        "TRAIN.CROWD_FILTER_THRESH", "0.7",
    ])
    # One proposal fully inside a crowd region, far from real gt -> excluded
    # from bg; one normal bg proposal.
    proposals = jnp.asarray(np.array([
        [60, 60, 70, 70],   # inside crowd
        [5, 40, 20, 55],    # normal bg
    ], np.float32))
    gt = jnp.asarray(np.array([[10, 10, 29, 29]], np.float32))
    crowd = jnp.asarray(np.array([[55, 55, 90, 90]], np.float32))
    out = T.sample_rois_one_image(
        proposals, jnp.ones(2, bool), gt, jnp.asarray([1], jnp.int32),
        jnp.asarray([True]), crowd, jnp.asarray([True]),
        jax.random.PRNGKey(3))
    rois = np.asarray(out["rois"])
    valid = np.asarray(out["valid"])
    sel = rois[valid]
    # crowd-interior proposal must not be among the sampled rois
    assert not any(np.allclose(r, [60, 60, 70, 70]) for r in sel)


def test_mask_targets_crop():
    # gt mask = left half of the gt box; RoI = right half of the gt box
    # -> target all zeros. RoI = left half -> all ones.
    gt_boxes = jnp.asarray(np.array([[0, 0, 100, 100]], np.float32))
    gt_masks = np.zeros((1, 28, 28), np.float32)
    gt_masks[:, :, :14] = 1.0
    rois = jnp.asarray(np.array([
        [0, 0, 49, 99],    # left half
        [51, 0, 100, 99],  # right half
    ], np.float32))
    fg = jnp.asarray([True, True])
    gt_idx = jnp.asarray([0, 0], jnp.int32)
    tgt, w = T.mask_targets_one_image(
        rois, fg, gt_idx, gt_boxes, jnp.asarray(gt_masks), 14)
    tgt = np.asarray(tgt)
    assert tgt[0].mean() > 0.9
    assert tgt[1].mean() < 0.1


def test_keypoint_targets_bins():
    config.merge_cfg_from_list(["KRCNN.HEATMAP_SIZE", "8",
                                "KRCNN.NUM_KEYPOINTS", "2"])
    rois = jnp.asarray(np.array([[0, 0, 80, 80]], np.float32))
    # kp0 at the roi center -> bin (4, 4) = 36; kp1 invisible
    kps = np.zeros((1, 2, 3), np.float32)
    kps[0, 0] = [40, 40, 2]
    kps[0, 1] = [10, 10, 0]
    bins, w = T.keypoint_targets_one_image(
        rois, jnp.asarray([True]), jnp.asarray([0], jnp.int32),
        jnp.asarray(kps))
    assert int(np.asarray(bins)[0, 0]) == 4 * 8 + 4
    assert np.asarray(w)[0, 0] == 1.0
    assert np.asarray(w)[0, 1] == 0.0
