"""Image blob preparation (host side).

Rebuilds lib/utils/blob.py: prep_im_for_blob (BGR float, mean subtraction,
isotropic resize with MAX_SIZE cap), im_list_to_blob (zero-pad to a common
canvas aligned to FPN.COARSEST_STRIDE), get_image_blob.

TPU difference: instead of padding to the per-batch max (dynamic shapes →
recompiles), images pad to a STATIC canvas derived from (SCALE, MAX_SIZE),
bucketed by orientation (landscape/portrait) — two compiled programs total.
Aspect-grouped batching (reference TRAIN.ASPECT_GROUPING) makes every batch
single-orientation.
"""

import cv2
import numpy as np

from detectron_tpu.core.config import cfg


def prep_im_for_blob(im, pixel_means, target_size, max_size):
    """im: HxWx3 BGR uint8. Returns (float32 image, scale)."""
    im = im.astype(np.float32, copy=False)
    im = im - pixel_means
    im_shape = im.shape
    im_size_min = np.min(im_shape[0:2])
    im_size_max = np.max(im_shape[0:2])
    im_scale = float(target_size) / float(im_size_min)
    if np.round(im_scale * im_size_max) > max_size:
        im_scale = float(max_size) / float(im_size_max)
    im = cv2.resize(im, None, None, fx=im_scale, fy=im_scale,
                    interpolation=cv2.INTER_LINEAR)
    return im, im_scale


def _align(v, stride):
    return int(np.ceil(v / float(stride)) * stride)


def static_canvas(target_size, max_size, landscape=True, stride=None):
    """Static (H, W) canvas for one orientation bucket."""
    stride = stride or (cfg.FPN.COARSEST_STRIDE if cfg.FPN.FPN_ON else 32)
    short = _align(target_size, stride)
    lng = _align(max_size, stride)
    return (short, lng) if landscape else (lng, short)


def im_to_canvas(im, canvas_hw):
    """Zero-pad a prepped image into the top-left of the static canvas."""
    H, W = canvas_hw
    h, w = im.shape[:2]
    assert h <= H and w <= W, \
        "image {}x{} exceeds canvas {}x{}".format(h, w, H, W)
    out = np.zeros((H, W, 3), np.float32)
    out[:h, :w] = im
    return out


def get_image_blob(im, target_size=None, max_size=None):
    """One image -> (blob (1, H, W, 3), im_scale, im_info (1, 3)).
    Uses TEST.SCALE/MAX_SIZE by default (reference _get_blobs path)."""
    target_size = target_size or cfg.TEST.SCALE
    max_size = max_size or cfg.TEST.MAX_SIZE
    prepped, scale = prep_im_for_blob(
        im, cfg.PIXEL_MEANS, target_size, max_size)
    landscape = prepped.shape[1] >= prepped.shape[0]
    canvas = static_canvas(target_size, max_size, landscape)
    blob = im_to_canvas(prepped, canvas)[None]
    im_info = np.array(
        [[prepped.shape[0], prepped.shape[1], scale]], np.float32)
    return blob, scale, im_info


def im_list_to_blob(ims, stride=None):
    """Pad a list of prepped images into one (N, Hmax, Wmax, 3) blob aligned
    to the coarsest stride (host/legacy path; static canvases preferred)."""
    stride = stride or (cfg.FPN.COARSEST_STRIDE if cfg.FPN.FPN_ON else 1)
    max_shape = np.array([im.shape[:2] for im in ims]).max(axis=0)
    H = _align(max_shape[0], stride) if stride > 1 else int(max_shape[0])
    W = _align(max_shape[1], stride) if stride > 1 else int(max_shape[1])
    blob = np.zeros((len(ims), H, W, 3), np.float32)
    for i, im in enumerate(ims):
        blob[i, :im.shape[0], :im.shape[1]] = im
    return blob


def space_to_depth(images):
    """(B, H, W, C) -> (B, (H+8)//2, (W+8)//2, 4C) host-side blocked input
    for the cfg.TPU.S2D_INPUT stem: pad 4 on each spatial side (the 7x7/s2
    stem's halo, pre-padded so the device conv is VALID), 2x2 block with
    channel order (dy, dx, c) — must match
    models/resnet._s2d_blocked_stem_conv's kernel transform."""
    B, H, W, C = images.shape
    assert H % 2 == 0 and W % 2 == 0, (H, W)
    xp = np.pad(images, ((0, 0), (4, 4), (4, 4), (0, 0)))
    P, Q = (H + 8) // 2, (W + 8) // 2
    x2 = xp.reshape(B, P, 2, Q, 2, C).transpose(0, 1, 3, 2, 4, 5)
    return np.ascontiguousarray(x2.reshape(B, P, Q, 4 * C))
