import numpy as np

from detectron_tpu.ops import anchors


# The canonical py-faster-rcnn / Detectron anchor set for stride 16,
# sizes (128, 256, 512), ratios (0.5, 1, 2) — byte-for-byte AP-critical.
GOLDEN_STRIDE16 = np.array(
    [
        [-84.0, -40.0, 99.0, 55.0],
        [-176.0, -88.0, 191.0, 103.0],
        [-360.0, -184.0, 375.0, 199.0],
        [-56.0, -56.0, 71.0, 71.0],
        [-120.0, -120.0, 135.0, 135.0],
        [-248.0, -248.0, 263.0, 263.0],
        [-36.0, -80.0, 51.0, 95.0],
        [-80.0, -168.0, 95.0, 183.0],
        [-168.0, -344.0, 183.0, 359.0],
    ]
)


def test_generate_anchors_golden():
    a = anchors.generate_anchors(
        stride=16, sizes=(128, 256, 512), aspect_ratios=(0.5, 1, 2)
    )
    np.testing.assert_array_equal(a, GOLDEN_STRIDE16.astype(np.float32))


def test_fpn_single_size_anchor():
    # FPN level anchors: one size per level, e.g. 32 at stride 4.
    a = anchors.generate_anchors(stride=4, sizes=(32,), aspect_ratios=(1.0,))
    # square 32x32 anchor centered on the stride-4 base box center (1.5)
    assert a.shape == (1, 4)
    w = a[0, 2] - a[0, 0] + 1
    h = a[0, 3] - a[0, 1] + 1
    assert w == 32 and h == 32
    cx = (a[0, 0] + a[0, 2]) / 2
    assert cx == 1.5


def test_anchor_field_shift():
    field = anchors.anchor_field(16, (128,), (1.0,), field_h=2, field_w=3)
    assert field.shape == (6, 4)
    # Anchor at cell (0,1) is cell (0,0) shifted by stride in x.
    np.testing.assert_allclose(field[1], field[0] + [16, 0, 16, 0])
    # Anchor at cell (1,0) is shifted by stride in y (row-major, A fastest).
    np.testing.assert_allclose(field[3], field[0] + [0, 16, 0, 16])
