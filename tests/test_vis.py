"""vis.py rendering fidelity (VERDICT r4 weak #7 / TODO completeness).

Reference: lib/utils/vis.py :: vis_keypoints / vis_one_image /
vis_one_image_opencv. The keypoint renderer's contract (checked
pixel-level here): each skeleton line l is drawn in colormap color
colors[l] at thickness 2 and alpha-blended 0.7 over the image; the two
synthetic torso lines (mid-shoulder->nose, mid-shoulder->mid-hip) use the
next two colormap entries; keypoints below kp_thresh draw nothing.
"""

import os

import numpy as np
import pytest

from detectron_tpu.utils import keypoints as keypoint_utils
from detectron_tpu.utils import vis
from detectron_tpu.utils.colormap import colormap


def _synthetic_person():
    """17 COCO keypoints laid out so no two skeleton lines overlap at the
    sample midpoints (200x260 canvas, person upright, limbs spread)."""
    names, _ = keypoint_utils.get_keypoints()
    pos = {
        "nose": (100, 30), "left_eye": (112, 20), "right_eye": (88, 20),
        "left_ear": (126, 26), "right_ear": (74, 26),
        "left_shoulder": (140, 60), "right_shoulder": (60, 60),
        "left_elbow": (165, 100), "right_elbow": (35, 100),
        "left_wrist": (180, 140), "right_wrist": (20, 140),
        "left_hip": (130, 150), "right_hip": (70, 150),
        "left_knee": (140, 200), "right_knee": (60, 200),
        "left_ankle": (150, 250), "right_ankle": (50, 250),
    }
    kps = np.zeros((4, len(names)), np.float32)
    for i, n in enumerate(names):
        kps[0, i], kps[1, i] = pos[n]
        kps[2, i] = 10.0   # logit above any kp_thresh
        kps[3, i] = 0.99
    return names, kps


def test_vis_keypoints_skeleton_lines_and_colors():
    names, kps = _synthetic_person()
    img = np.zeros((260, 200, 3), np.uint8)
    out = vis.vis_keypoints(img, kps, kp_thresh=2, alpha=0.7)
    assert out.shape == img.shape and out.dtype == np.uint8

    cmap = colormap(rgb=True)
    kp_lines = vis.kp_connections(names)
    # Each limb line: the midpoint pixel must carry ~0.7 * colors[l]
    # (AA-blended over black; integer rounding + AA give a few counts).
    for l, (i1, i2) in enumerate(kp_lines):
        mx = int(round((kps[0, i1] + kps[0, i2]) / 2))
        my = int(round((kps[1, i1] + kps[1, i2]) / 2))
        expected = 0.7 * cmap[l % len(cmap)]
        got = out[my, mx].astype(np.float32)
        assert np.abs(got - expected).max() < 40, (
            l, names[i1], names[i2], got, expected)

    # Torso lines: mid_shoulder->nose uses colors[len(kp_lines)],
    # mid_shoulder->mid_hip uses colors[len(kp_lines)+1].
    msh = (kps[:2, names.index("left_shoulder")]
           + kps[:2, names.index("right_shoulder")]) / 2
    mhip = (kps[:2, names.index("left_hip")]
            + kps[:2, names.index("right_hip")]) / 2
    nose = kps[:2, names.index("nose")]
    for seg_i, (a, b) in enumerate([(msh, nose), (msh, mhip)]):
        mid = ((a + b) / 2).astype(int)
        expected = 0.7 * cmap[(len(kp_lines) + seg_i) % len(cmap)]
        got = out[mid[1], mid[0]].astype(np.float32)
        assert np.abs(got - expected).max() < 40, (seg_i, got, expected)

    # Pixels far from any line stay black.
    assert out[5, 5].max() == 0 and out[255, 195].max() == 0


def test_vis_keypoints_threshold_suppression():
    """Keypoints at/below kp_thresh draw nothing — image unchanged."""
    _, kps = _synthetic_person()
    kps[2, :] = 1.0  # all below the default threshold of 2
    img = np.full((260, 200, 3), 37, np.uint8)
    out = vis.vis_keypoints(img, kps, kp_thresh=2)
    np.testing.assert_array_equal(out, img)


def test_vis_keypoints_partial_visibility():
    """A single below-threshold joint removes exactly its incident limb
    lines (connectivity: the renderer gates each segment on BOTH ends)."""
    names, kps = _synthetic_person()
    kps[2, names.index("left_elbow")] = 0.0
    img = np.zeros((260, 200, 3), np.uint8)
    out = vis.vis_keypoints(img, kps, kp_thresh=2)
    kp_lines = vis.kp_connections(names)
    for l, (i1, i2) in enumerate(kp_lines):
        mx = int(round((kps[0, i1] + kps[0, i2]) / 2))
        my = int(round((kps[1, i1] + kps[1, i2]) / 2))
        touches = names.index("left_elbow") in (i1, i2)
        if touches:
            assert out[my, mx].max() == 0, (l, names[i1], names[i2])
        else:
            assert out[my, mx].max() > 0, (l, names[i1], names[i2])


def test_vis_one_image_writes_file(tmp_path):
    """matplotlib path: boxes + keypoints -> a nonempty pdf (and png)."""
    _, kps = _synthetic_person()
    im = np.zeros((260, 200, 3), np.uint8)
    boxes = np.array([[10.0, 10.0, 190.0, 250.0, 0.95]], np.float32)
    for ext in ("pdf", "png"):
        vis.vis_one_image(im, "det_example", str(tmp_path), boxes,
                          segms=None, keypoints=[kps], thresh=0.9,
                          kp_thresh=2, ext=ext)
        f = tmp_path / ("det_example." + ext)
        assert f.exists() and f.stat().st_size > 0


def test_vis_one_image_opencv_boxes_masks_kps():
    """OpenCV path end-to-end: box + class + mask + keypoints all render
    (output differs from input; box edge pixel is _GREEN)."""
    from detectron_tpu.data import rle as mask_util

    _, kps = _synthetic_person()
    im = np.zeros((260, 200, 3), np.uint8)
    boxes = np.array([[20.0, 20.0, 180.0, 240.0, 0.95]], np.float32)
    m = np.zeros((260, 200), np.uint8)
    m[60:150, 60:140] = 1
    segm = mask_util.encode(np.asfortranarray(m))
    out = vis.vis_one_image_opencv(
        im, boxes, segms=[segm], keypoints=[kps], thresh=0.9, kp_thresh=2,
        show_box=True, show_class=True)
    assert out.shape == im.shape
    assert not np.array_equal(out, im)
    # Box border drawn in _GREEN at the top-left corner.
    assert tuple(out[20, 20]) == vis._GREEN
