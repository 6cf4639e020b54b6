"""Host post-processing: paste_mask (segm_results), box voting, expand_boxes."""

import numpy as np
import pytest

from detectron_tpu.core import config
from detectron_tpu.core.config import cfg
from detectron_tpu.utils import boxes as box_utils


def test_expand_boxes():
    b = np.array([[10.0, 20.0, 30.0, 40.0]])
    e = box_utils.expand_boxes(b, 2.0)
    # center preserved, size doubled
    np.testing.assert_allclose((e[0, 0] + e[0, 2]) / 2, 20.0)
    np.testing.assert_allclose((e[0, 1] + e[0, 3]) / 2, 30.0)
    np.testing.assert_allclose(e[0, 2] - e[0, 0], 40.0)


def test_segm_results_paste():
    from detectron_tpu.core import test_engine

    config.merge_cfg_from_list(["MRCNN.THRESH_BINARIZE", "0.5"])
    # One detection with a solid mask -> pasted mask covers ~the box.
    det = np.array([[20.0, 30.0, 59.0, 79.0]], np.float32)
    probs = np.ones((1, 28, 28), np.float32)
    rles = test_engine.segm_results(det, np.array([1]), probs, 120, 100)
    from detectron_tpu.data import rle as mask_util

    m = mask_util.decode(rles[0])
    assert m.shape == (120, 100)
    # inside the box: filled
    assert m[50, 40] == 1
    # far corner: empty
    assert m[0, 0] == 0
    # area close to the expanded box area
    box_area = (59 - 20) * (79 - 30)
    assert abs(int(m.sum()) - box_area) / box_area < 0.25


def test_segm_results_half_mask():
    from detectron_tpu.core import test_engine

    det = np.array([[0.0, 0.0, 55.0, 55.0]], np.float32)
    probs = np.zeros((1, 28, 28), np.float32)
    probs[0, :, :14] = 1.0  # left half
    rles = test_engine.segm_results(det, np.array([1]), probs, 60, 60)
    from detectron_tpu.data import rle as mask_util

    m = mask_util.decode(rles[0])
    assert m[28, 5] == 1   # left side
    assert m[28, 50] == 0  # right side


def test_box_voting_id():
    # Two clustered boxes + scores: the kept box moves toward the weighted
    # average of its cluster.
    top = np.array([[10.0, 10.0, 20.0, 20.0, 0.9]], np.float32)
    all_dets = np.array([
        [10.0, 10.0, 20.0, 20.0, 0.9],
        [12.0, 12.0, 22.0, 22.0, 0.1],
    ], np.float32)
    out = box_utils.box_voting(top, all_dets, thresh=0.5,
                               scoring_method="ID")
    expect = (all_dets[0, :4] * 0.9 + all_dets[1, :4] * 0.1) / 1.0
    np.testing.assert_allclose(out[0, :4], expect, rtol=1e-5)
    assert out[0, 4] == pytest.approx(0.9)


def test_box_voting_avg_scoring():
    top = np.array([[10.0, 10.0, 20.0, 20.0, 0.9]], np.float32)
    all_dets = np.array([
        [10.0, 10.0, 20.0, 20.0, 0.9],
        [11.0, 11.0, 21.0, 21.0, 0.5],
    ], np.float32)
    out = box_utils.box_voting(top, all_dets, thresh=0.5,
                               scoring_method="AVG")
    assert out[0, 4] == pytest.approx(0.7)
