"""In-graph (jnp) box geometry — the jit-side twin of utils/boxes.py.

These run inside the compiled step (proposal generation, target assignment,
box decoding), replacing the reference's host-side numpy calls from
lib/utils/boxes.py and the Cython lib/utils/cython_bbox.pyx. All functions are
shape-polymorphic over a leading box dimension and contain no data-dependent
control flow.

Boxes are [x1, y1, x2, y2]; Detectron's +1 edge convention (width =
x2 - x1 + 1) is preserved exactly for AP parity.
"""

import math

import jax.numpy as jnp

# Detectron clips dw/dh at log(1000/16) before exp (cfg.BBOX_XFORM_CLIP).
BBOX_XFORM_CLIP_DEFAULT = math.log(1000.0 / 16.0)


def boxes_area(boxes):
    w = boxes[..., 2] - boxes[..., 0] + 1.0
    h = boxes[..., 3] - boxes[..., 1] + 1.0
    return w * h


def bbox_overlaps(boxes, query_boxes):
    """Pairwise IoU matrix (..., N, K) with Detectron +1 edge convention.
    Zero where there is no overlap (matches cython_bbox.bbox_overlaps)."""
    area_b = boxes_area(boxes)  # (..., N)
    area_q = boxes_area(query_boxes)  # (..., K)

    ix1 = jnp.maximum(boxes[..., :, None, 0], query_boxes[..., None, :, 0])
    iy1 = jnp.maximum(boxes[..., :, None, 1], query_boxes[..., None, :, 1])
    ix2 = jnp.minimum(boxes[..., :, None, 2], query_boxes[..., None, :, 2])
    iy2 = jnp.minimum(boxes[..., :, None, 3], query_boxes[..., None, :, 3])

    iw = jnp.maximum(ix2 - ix1 + 1.0, 0.0)
    ih = jnp.maximum(iy2 - iy1 + 1.0, 0.0)
    inter = iw * ih
    union = area_b[..., :, None] + area_q[..., None, :] - inter
    return jnp.where(inter > 0, inter / union, 0.0)


def bbox_transform(boxes, deltas, weights=(1.0, 1.0, 1.0, 1.0),
                   clip=BBOX_XFORM_CLIP_DEFAULT):
    """Decode regression deltas into boxes. boxes: (..., N, 4); deltas may be
    (..., N, 4*C) tiled per class. Mirrors utils/boxes.bbox_transform."""
    widths = boxes[..., 2] - boxes[..., 0] + 1.0
    heights = boxes[..., 3] - boxes[..., 1] + 1.0
    ctr_x = boxes[..., 0] + 0.5 * widths
    ctr_y = boxes[..., 1] + 0.5 * heights

    wx, wy, ww, wh = weights
    dx = deltas[..., 0::4] / wx
    dy = deltas[..., 1::4] / wy
    dw = jnp.minimum(deltas[..., 2::4] / ww, clip)
    dh = jnp.minimum(deltas[..., 3::4] / wh, clip)

    pred_ctr_x = dx * widths[..., None] + ctr_x[..., None]
    pred_ctr_y = dy * heights[..., None] + ctr_y[..., None]
    pred_w = jnp.exp(dw) * widths[..., None]
    pred_h = jnp.exp(dh) * heights[..., None]

    x1 = pred_ctr_x - 0.5 * pred_w
    y1 = pred_ctr_y - 0.5 * pred_h
    x2 = pred_ctr_x + 0.5 * pred_w - 1.0
    y2 = pred_ctr_y + 0.5 * pred_h - 1.0
    # Interleave back to (..., 4*C) layout
    out = jnp.stack([x1, y1, x2, y2], axis=-1)  # (..., C, 4)
    return out.reshape(deltas.shape)


def bbox_transform_inv(boxes, gt_boxes, weights=(1.0, 1.0, 1.0, 1.0)):
    """Encode: regression targets taking `boxes` to `gt_boxes` (..., N, 4)."""
    ex_w = boxes[..., 2] - boxes[..., 0] + 1.0
    ex_h = boxes[..., 3] - boxes[..., 1] + 1.0
    ex_cx = boxes[..., 0] + 0.5 * ex_w
    ex_cy = boxes[..., 1] + 0.5 * ex_h

    gt_w = gt_boxes[..., 2] - gt_boxes[..., 0] + 1.0
    gt_h = gt_boxes[..., 3] - gt_boxes[..., 1] + 1.0
    gt_cx = gt_boxes[..., 0] + 0.5 * gt_w
    gt_cy = gt_boxes[..., 1] + 0.5 * gt_h

    wx, wy, ww, wh = weights
    # Guard against degenerate (padded) boxes: clamp sizes to >= 1.
    ex_w = jnp.maximum(ex_w, 1.0)
    ex_h = jnp.maximum(ex_h, 1.0)
    gt_w = jnp.maximum(gt_w, 1.0)
    gt_h = jnp.maximum(gt_h, 1.0)

    dx = wx * (gt_cx - ex_cx) / ex_w
    dy = wy * (gt_cy - ex_cy) / ex_h
    dw = ww * jnp.log(gt_w / ex_w)
    dh = wh * jnp.log(gt_h / ex_h)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def clip_boxes_to_image(boxes, height, width):
    """Clip boxes (..., 4) to [0, width-1] x [0, height-1]. height/width may be
    per-example arrays broadcastable against the leading dims."""
    height = jnp.asarray(height, boxes.dtype)
    width = jnp.asarray(width, boxes.dtype)
    x1 = jnp.clip(boxes[..., 0], 0.0, width - 1.0)
    y1 = jnp.clip(boxes[..., 1], 0.0, height - 1.0)
    x2 = jnp.clip(boxes[..., 2], 0.0, width - 1.0)
    y2 = jnp.clip(boxes[..., 3], 0.0, height - 1.0)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def clip_tiled_boxes(boxes, height, width):
    """Clip (..., 4*C) tiled boxes to the image. height/width broadcast over
    leading dims (append trailing axis as needed by callers)."""
    height = jnp.asarray(height, boxes.dtype)
    width = jnp.asarray(width, boxes.dtype)
    x1 = jnp.clip(boxes[..., 0::4], 0.0, width - 1.0)
    y1 = jnp.clip(boxes[..., 1::4], 0.0, height - 1.0)
    x2 = jnp.clip(boxes[..., 2::4], 0.0, width - 1.0)
    y2 = jnp.clip(boxes[..., 3::4], 0.0, height - 1.0)
    out = jnp.stack([x1, y1, x2, y2], axis=-1)  # (..., C, 4)
    return out.reshape(boxes.shape)


def small_box_mask(boxes, min_size):
    """True where width and height are both >= min_size (the complement of
    utils/boxes.filter_small_boxes, as a mask — indices are dynamic)."""
    w = boxes[..., 2] - boxes[..., 0] + 1.0
    h = boxes[..., 3] - boxes[..., 1] + 1.0
    return (w >= min_size) & (h >= min_size)
