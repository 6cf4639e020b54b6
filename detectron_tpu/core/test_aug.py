"""Test-time augmentation (multi-scale / horizontal-flip / aspect-ratio).

Rebuilds lib/core/test.py's TTA surface: im_detect_bbox_aug (with
TEST.BBOX_AUG.SCORE_HEUR/COORD_HEUR combination), im_detect_mask_aug
(HEUR: SOFT_AVG | SOFT_MAX | LOGIT_AVG), im_detect_kps_aug (HM_AVG |
HM_MAX). Each augmented pass is one device program (core/test.detect_raw or
the mask/keypoint graphs); the host only transforms boxes between coordinate
frames and combines.
"""

import numpy as np

from detectron_tpu.core.config import cfg
from detectron_tpu.core import test as test_ops
from detectron_tpu.utils import blob as blob_utils
from detectron_tpu.utils import boxes as box_utils


def _prep(im, target_size, max_size, hflip=False):
    img = im[:, ::-1, :] if hflip else im
    prepped, scale = blob_utils.prep_im_for_blob(
        img, cfg.PIXEL_MEANS, target_size, max_size)
    landscape = prepped.shape[1] >= prepped.shape[0]
    canvas = blob_utils.static_canvas(target_size, max_size, landscape)
    blob = blob_utils.im_to_canvas(prepped, canvas)[None]
    im_info = np.array([[prepped.shape[0], prepped.shape[1], scale]],
                       np.float32)
    return blob, scale, im_info


def _run_raw(detect_raw_fn, params, im, target_size, max_size, hflip=False):
    """One augmented pass -> (scores (R, C), boxes (R, 4C) in ORIGINAL image
    coords)."""
    import jax.numpy as jnp

    blob, scale, im_info = _prep(im, target_size, max_size, hflip)
    out = detect_raw_fn(params, jnp.asarray(blob), jnp.asarray(im_info))
    scores = np.asarray(out["scores"][0])
    boxes = np.asarray(out["boxes"][0]) / scale
    if hflip:
        boxes = box_utils.flip_boxes(boxes, im.shape[1])
    return scores, boxes


def im_detect_bbox_aug(detect_raw_fn, params, im):
    """Union (or average) of raw detections over the configured augs,
    followed by nothing — the caller applies NMS (reference:
    im_detect_bbox_aug + box_results_with_nms_and_limit)."""
    assert not cfg.TEST.BBOX_AUG.SCALE_SIZE_DEP, "not supported"
    scores_ts = []
    boxes_ts = []

    base_scores, base_boxes = _run_raw(
        detect_raw_fn, params, im, cfg.TEST.SCALE, cfg.TEST.MAX_SIZE)
    scores_ts.append(base_scores)
    boxes_ts.append(base_boxes)

    if cfg.TEST.BBOX_AUG.H_FLIP:
        s, b = _run_raw(detect_raw_fn, params, im, cfg.TEST.SCALE,
                        cfg.TEST.MAX_SIZE, hflip=True)
        scores_ts.append(s)
        boxes_ts.append(b)

    for scale in cfg.TEST.BBOX_AUG.SCALES:
        max_size = cfg.TEST.BBOX_AUG.MAX_SIZE
        s, b = _run_raw(detect_raw_fn, params, im, scale, max_size)
        scores_ts.append(s)
        boxes_ts.append(b)
        if cfg.TEST.BBOX_AUG.SCALE_H_FLIP:
            s, b = _run_raw(detect_raw_fn, params, im, scale, max_size,
                            hflip=True)
            scores_ts.append(s)
            boxes_ts.append(b)

    for ar in cfg.TEST.BBOX_AUG.ASPECT_RATIOS:
        im_ar = _aspect_ratio_rel(im, ar)
        s, b = _run_raw(detect_raw_fn, params, im_ar, cfg.TEST.SCALE,
                        cfg.TEST.MAX_SIZE)
        b = box_utils.aspect_ratio(b, 1.0 / ar)
        scores_ts.append(s)
        boxes_ts.append(b)
        if cfg.TEST.BBOX_AUG.ASPECT_RATIO_H_FLIP:
            s, b = _run_raw(detect_raw_fn, params, im_ar, cfg.TEST.SCALE,
                            cfg.TEST.MAX_SIZE, hflip=True)
            b = box_utils.aspect_ratio(
                box_utils.flip_boxes(
                    box_utils.flip_boxes(b, im_ar.shape[1]), im_ar.shape[1]),
                1.0 / ar)
            scores_ts.append(s)
            boxes_ts.append(b)

    # Combine
    if cfg.TEST.BBOX_AUG.SCORE_HEUR == "UNION":
        scores_c = np.vstack(scores_ts)
    elif cfg.TEST.BBOX_AUG.SCORE_HEUR == "AVG":
        scores_c = np.mean(scores_ts, axis=0)
    else:
        raise NotImplementedError(cfg.TEST.BBOX_AUG.SCORE_HEUR)

    if cfg.TEST.BBOX_AUG.COORD_HEUR == "UNION":
        boxes_c = np.vstack(boxes_ts)
    elif cfg.TEST.BBOX_AUG.COORD_HEUR == "AVG":
        boxes_c = np.mean(boxes_ts, axis=0)
    else:
        raise NotImplementedError(cfg.TEST.BBOX_AUG.COORD_HEUR)

    assert (cfg.TEST.BBOX_AUG.SCORE_HEUR == "UNION") == \
        (cfg.TEST.BBOX_AUG.COORD_HEUR == "UNION"), \
        "UNION must be used for both or neither"
    return scores_c, boxes_c


def _aspect_ratio_rel(im, aspect_ratio):
    """Width-relative aspect-ratio warp (reference: lib/utils/image.py)."""
    import cv2

    new_w = int(np.round(im.shape[1] * aspect_ratio))
    return cv2.resize(im, (new_w, im.shape[0]))


def im_detect_mask_aug(mask_fn, params, im, boxes):
    """mask_fn(params, blob, im_info, boxes_scaled) -> (D, M, M) probs for
    one image; combine over augs per TEST.MASK_AUG.HEUR."""
    masks_ts = []

    def run(img, target_size, max_size, hflip, boxes_orig):
        import jax.numpy as jnp

        blob, scale, im_info = _prep(img, target_size, max_size, hflip)
        b = boxes_orig.copy()
        if hflip:
            b = box_utils.flip_boxes(b, img.shape[1])
        probs = np.asarray(mask_fn(
            params, jnp.asarray(blob), jnp.asarray(im_info),
            jnp.asarray((b * scale)[None].astype(np.float32)))[0])
        if hflip:
            probs = probs[:, :, ::-1]
        return probs

    masks_ts.append(run(im, cfg.TEST.SCALE, cfg.TEST.MAX_SIZE, False, boxes))
    if cfg.TEST.MASK_AUG.H_FLIP:
        masks_ts.append(run(im, cfg.TEST.SCALE, cfg.TEST.MAX_SIZE, True,
                            boxes))
    for scale in cfg.TEST.MASK_AUG.SCALES:
        masks_ts.append(run(im, scale, cfg.TEST.MASK_AUG.MAX_SIZE, False,
                            boxes))
        if cfg.TEST.MASK_AUG.SCALE_H_FLIP:
            masks_ts.append(run(im, scale, cfg.TEST.MASK_AUG.MAX_SIZE, True,
                                boxes))

    heur = cfg.TEST.MASK_AUG.HEUR
    if heur == "SOFT_AVG":
        return np.mean(masks_ts, axis=0)
    elif heur == "SOFT_MAX":
        return np.amax(masks_ts, axis=0)
    elif heur == "LOGIT_AVG":
        logits = [np.log(m / np.clip(1 - m, 1e-12, None) + 1e-12)
                  for m in masks_ts]
        from scipy.special import expit

        return expit(np.mean(logits, axis=0))
    raise NotImplementedError(heur)


def im_detect_kps_aug(kps_fn, params, im, boxes):
    """Analogous combination for keypoint heatmaps (HM_AVG | HM_MAX)."""
    hms_ts = []

    def run(img, target_size, max_size, hflip, boxes_orig):
        import jax.numpy as jnp

        from detectron_tpu.utils import keypoints as kp_utils

        blob, scale, im_info = _prep(img, target_size, max_size, hflip)
        b = boxes_orig.copy()
        if hflip:
            b = box_utils.flip_boxes(b, img.shape[1])
        hm = np.asarray(kps_fn(
            params, jnp.asarray(blob), jnp.asarray(im_info),
            jnp.asarray((b * scale)[None].astype(np.float32)))[0])
        if hflip:
            # flip horizontally + swap left/right keypoint channels
            hm = hm[:, :, ::-1, :]
            names, flip_map = kp_utils.get_keypoints()
            perm = list(range(len(names)))
            for l, r in flip_map.items():
                li, ri = names.index(l), names.index(r)
                perm[li], perm[ri] = ri, li
            hm = hm[..., perm]
        return hm

    hms_ts.append(run(im, cfg.TEST.SCALE, cfg.TEST.MAX_SIZE, False, boxes))
    if cfg.TEST.KPS_AUG.H_FLIP:
        hms_ts.append(run(im, cfg.TEST.SCALE, cfg.TEST.MAX_SIZE, True, boxes))
    for scale in cfg.TEST.KPS_AUG.SCALES:
        hms_ts.append(run(im, scale, cfg.TEST.KPS_AUG.MAX_SIZE, False, boxes))
        if cfg.TEST.KPS_AUG.SCALE_H_FLIP:
            hms_ts.append(run(im, scale, cfg.TEST.KPS_AUG.MAX_SIZE, True,
                              boxes))

    heur = cfg.TEST.KPS_AUG.HEUR
    if heur == "HM_AVG":
        return np.mean(hms_ts, axis=0)
    elif heur == "HM_MAX":
        return np.amax(hms_ts, axis=0)
    raise NotImplementedError(heur)
