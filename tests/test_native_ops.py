"""Native C++ host ops must match their numpy reference twins exactly."""

import numpy as np
import pytest

from detectron_tpu import native
from detectron_tpu.data import rle as pyrle
from detectron_tpu.utils import boxes as box_utils

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib unavailable")


def _rand_dets(rng, n):
    x1 = rng.uniform(0, 100, n)
    y1 = rng.uniform(0, 100, n)
    w = rng.uniform(5, 40, n)
    h = rng.uniform(5, 40, n)
    s = rng.uniform(0, 1, n)
    return np.stack([x1, y1, x1 + w, y1 + h, s], 1).astype(np.float32)


def test_nms_matches_numpy():
    rng = np.random.RandomState(0)
    for n in (1, 17, 200, 513):
        dets = _rand_dets(rng, n)
        for t in (0.3, 0.5, 0.7):
            assert native.nms(dets, t) == box_utils.nms(dets, t)


def test_bbox_overlaps_matches_numpy():
    rng = np.random.RandomState(1)
    a = _rand_dets(rng, 31)[:, :4]
    b = _rand_dets(rng, 13)[:, :4]
    np.testing.assert_allclose(
        native.bbox_overlaps(a, b), box_utils.bbox_overlaps(a, b),
        rtol=1e-12)


def test_rle_roundtrip_matches_python():
    rng = np.random.RandomState(2)
    for _ in range(5):
        m = (rng.rand(37, 23) > 0.6).astype(np.uint8)
        c_native = native.rle_encode(m)
        c_py = pyrle.encode_counts(m)
        assert c_native == c_py
        np.testing.assert_array_equal(
            native.rle_decode(c_native, 37, 23), m)


def test_poly_to_counts_matches_python():
    polys = [
        [1, 1, 8, 1, 8, 8, 1, 8],
        [0.5, 0.5, 10.2, 1.1, 9.7, 11.8, 2.2, 10.0],
        [3, 0, 12, 5, 6, 12],
    ]
    for p in polys:
        c_native = native.poly_to_counts(p, 16, 16)
        c_py = pyrle.poly_to_counts(p, 16, 16)
        assert c_native == c_py, p


def test_rle_intersection_matches_decode():
    rng = np.random.RandomState(3)
    a = (rng.rand(40, 30) > 0.5).astype(np.uint8)
    b = (rng.rand(40, 30) > 0.5).astype(np.uint8)
    ca = native.rle_encode(a)
    cb = native.rle_encode(b)
    inter = native.rle_intersection(ca, cb)
    assert inter == int(np.logical_and(a, b).sum())
