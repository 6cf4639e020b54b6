import numpy as np

from detectron_tpu.data import rle


def test_counts_roundtrip():
    rng = np.random.RandomState(0)
    for _ in range(10):
        m = (rng.rand(17, 23) > 0.5).astype(np.uint8)
        c = rle.encode_counts(m)
        m2 = rle.decode_counts(c, 17, 23)
        np.testing.assert_array_equal(m, m2)


def test_string_roundtrip():
    rng = np.random.RandomState(1)
    for _ in range(10):
        m = (rng.rand(31, 19) > 0.7).astype(np.uint8)
        r = rle.encode(m)
        assert isinstance(r["counts"], str)
        m2 = rle.decode(r)
        np.testing.assert_array_equal(m, m2)


def test_string_roundtrip_large_counts():
    # exercise multi-char varints and negative deltas
    m = np.zeros((400, 500), np.uint8)
    m[100:300, 150:450] = 1
    m2 = rle.decode(rle.encode(m))
    np.testing.assert_array_equal(m, m2)


def test_known_small_rle_string():
    # 3x3 mask with a single center pixel: column-major counts [4,1,4]
    m = np.zeros((3, 3), np.uint8)
    m[1, 1] = 1
    c = rle.encode_counts(m)
    assert c == [4, 1, 4]
    s = rle.counts_to_string(c)
    assert rle.string_to_counts(s) == [4, 1, 4]


def test_poly_square():
    # A square polygon covering pixels [1..3] x [1..3]
    poly = [1, 1, 4, 1, 4, 4, 1, 4]
    m = rle.polys_to_mask([poly], 6, 6)
    # Interior should contain the center, exterior corners empty
    assert m[2, 2] == 1
    assert m[0, 0] == 0 and m[5, 5] == 0
    a = rle.area(rle.encode(m))
    assert a == int(m.sum())


def test_poly_matches_halfopen_grid_convention():
    # COCO convention: polygon [0,0, w,0, w,h, 0,h] covers the whole image.
    h, w = 5, 7
    poly = [0, 0, w, 0, w, h, 0, h]
    m = rle.polys_to_mask([poly], h, w)
    assert m.sum() == h * w


def test_merge_and_iou():
    a = np.zeros((10, 10), np.uint8)
    a[:5] = 1
    b = np.zeros((10, 10), np.uint8)
    b[3:8] = 1
    ra_, rb = rle.encode(a), rle.encode(b)
    u = rle.decode(rle.merge([ra_, rb]))
    assert u.sum() == 80
    i = rle.decode(rle.merge([ra_, rb], intersect=True))
    assert i.sum() == 20
    m = rle.iou([ra_], [rb], [0])
    np.testing.assert_allclose(m[0, 0], 20.0 / 80.0)
    mc = rle.iou([ra_], [rb], [1])  # crowd: intersection / dt area
    np.testing.assert_allclose(mc[0, 0], 20.0 / 50.0)


def test_to_bbox():
    m = np.zeros((20, 30), np.uint8)
    m[5:15, 8:20] = 1
    bb = rle.to_bbox(rle.encode(m))
    np.testing.assert_array_equal(bb, [8, 5, 12, 10])


def test_encode_crop_matches_full_paste():
    """encode_crop (O(crop) detection hot path) must be bit-identical to
    pasting the crop into a zero canvas and encoding it whole, across edge
    placements, empty crops, and crops touching the image borders."""
    rng = np.random.RandomState(0)
    h, w = 37, 53
    cases = [
        (rng.rand(5, 7) > 0.5, 3, 11),
        (rng.rand(1, 1) > 0.2, 0, 0),          # top-left corner
        (rng.rand(4, 6) > 0.5, w - 6, h - 4),  # bottom-right corner
        (np.ones((37, 53), bool), 0, 0),       # whole image
        (np.zeros((5, 5), bool), 10, 10),      # empty crop
        (rng.rand(37, 1) > 0.5, 20, 0),        # full-height column
        (rng.rand(1, 53) > 0.5, 0, 15),        # full-width row
        (np.zeros((0, 4), bool), 2, 2),        # degenerate shape
    ]
    for crop, x0, y0 in cases:
        crop = np.asarray(crop, np.uint8)
        ch, cw = crop.shape
        canvas = np.zeros((h, w), np.uint8)
        canvas[y0:y0 + ch, x0:x0 + cw] = crop
        a = rle.encode(canvas)
        b = rle.encode_crop(crop, x0, y0, h, w)
        assert a["size"] == b["size"]
        assert a["counts"] == b["counts"], (x0, y0, crop.shape)
    # randomized sweep
    for _ in range(50):
        ch = rng.randint(1, h + 1)
        cw = rng.randint(1, w + 1)
        y0 = rng.randint(0, h - ch + 1)
        x0 = rng.randint(0, w - cw + 1)
        crop = (rng.rand(ch, cw) > rng.rand()).astype(np.uint8)
        canvas = np.zeros((h, w), np.uint8)
        canvas[y0:y0 + ch, x0:x0 + cw] = crop
        assert rle.encode(canvas)["counts"] == \
            rle.encode_crop(crop, x0, y0, h, w)["counts"]
