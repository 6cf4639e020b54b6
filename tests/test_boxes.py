import numpy as np
import jax.numpy as jnp

from detectron_tpu.ops import box_ops
from detectron_tpu.utils import boxes as box_utils


def _rand_boxes(rng, n, size=200):
    x1 = rng.uniform(0, size, n)
    y1 = rng.uniform(0, size, n)
    w = rng.uniform(1, size / 2, n)
    h = rng.uniform(1, size / 2, n)
    return np.stack([x1, y1, x1 + w, y1 + h], axis=1).astype(np.float32)


def test_bbox_overlaps_hand_values():
    a = np.array([[0, 0, 9, 9]], dtype=np.float32)  # 10x10 box, area 100
    b = np.array(
        [[0, 0, 9, 9], [5, 5, 14, 14], [20, 20, 29, 29]], dtype=np.float32
    )
    ov = box_utils.bbox_overlaps(a, b)
    # identical: 1; 5..9 overlap = 5x5=25, union 175; disjoint: 0
    np.testing.assert_allclose(ov[0], [1.0, 25.0 / 175.0, 0.0], atol=1e-6)


def test_bbox_overlaps_np_vs_jnp():
    rng = np.random.RandomState(0)
    a = _rand_boxes(rng, 17)
    b = _rand_boxes(rng, 23)
    ov_np = box_utils.bbox_overlaps(a, b)
    ov_j = np.asarray(box_ops.bbox_overlaps(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(ov_np, ov_j, rtol=1e-5, atol=1e-5)


def test_transform_roundtrip_np():
    rng = np.random.RandomState(1)
    boxes = _rand_boxes(rng, 32)
    gt = _rand_boxes(rng, 32)
    weights = (10.0, 10.0, 5.0, 5.0)
    deltas = box_utils.bbox_transform_inv(boxes, gt, weights)
    rec = box_utils.bbox_transform(boxes, deltas.astype(np.float32), weights)
    np.testing.assert_allclose(rec, gt, rtol=1e-3, atol=1e-2)


def test_transform_np_vs_jnp():
    rng = np.random.RandomState(2)
    boxes = _rand_boxes(rng, 16)
    deltas = rng.uniform(-1, 1, (16, 8)).astype(np.float32)  # 2 classes tiled
    weights = (10.0, 10.0, 5.0, 5.0)
    out_np = box_utils.bbox_transform(boxes, deltas, weights)
    out_j = np.asarray(
        box_ops.bbox_transform(jnp.asarray(boxes), jnp.asarray(deltas), weights)
    )
    np.testing.assert_allclose(out_np, out_j, rtol=1e-4, atol=1e-3)

    enc_np = box_utils.bbox_transform_inv(boxes, out_np[:, :4], weights)
    enc_j = np.asarray(
        box_ops.bbox_transform_inv(
            jnp.asarray(boxes), jnp.asarray(out_np[:, :4]), weights
        )
    )
    np.testing.assert_allclose(enc_np, enc_j, rtol=1e-4, atol=1e-3)


def test_clip_tiled_np_vs_jnp():
    rng = np.random.RandomState(3)
    boxes = rng.uniform(-50, 300, (11, 8)).astype(np.float32)
    out_np = box_utils.clip_tiled_boxes(boxes.copy(), (200, 250))
    out_j = np.asarray(
        box_ops.clip_tiled_boxes(jnp.asarray(boxes), 200.0, 250.0)
    )
    np.testing.assert_allclose(out_np, out_j, rtol=1e-6)


def test_xywh_xyxy_roundtrip():
    rng = np.random.RandomState(4)
    b = _rand_boxes(rng, 9)
    np.testing.assert_allclose(
        box_utils.xywh_to_xyxy(box_utils.xyxy_to_xywh(b)), b, rtol=1e-6
    )


def test_flip_boxes_involution():
    rng = np.random.RandomState(5)
    b = _rand_boxes(rng, 9)
    np.testing.assert_allclose(
        box_utils.flip_boxes(box_utils.flip_boxes(b, 300), 300), b,
        rtol=1e-5, atol=1e-4,
    )
