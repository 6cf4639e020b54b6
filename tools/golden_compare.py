#!/usr/bin/env python
"""Stage-wise golden-tensor dump + diff harness for AP-parity validation.

The moment real Detectron model-zoo weights (.pkl) and real images exist,
this tool localizes any import/numerics divergence in hours, not days:

  1) DUMP per-stage activations from this framework for one image:
       python tools/golden_compare.py --cfg configs/baselines/e2e_mask_rcnn_R-50-FPN_1x.yaml \
           --pkl /path/model_final.pkl --image /path/img.jpg --out /tmp/tpu_stages.npz
     Stages dumped: input blob, stem, res2..res5, FPN P2..P6, per-level RPN
     cls/bbox, proposals (boxes/scores), pooled RoI features, box-head
     feature, cls softmax, bbox deltas, final detections, mask probs.

  2) DIFF two dumps (ours vs a reference-side dump with matching keys, or
     two builds of ours):
       python tools/golden_compare.py --diff /tmp/tpu_stages.npz /tmp/ref_stages.npz

The reference-side dump is produced by running the public
roytseng-tw/Detectron.pytorch (lib/modeling/model_builder.py ::
Generalized_RCNN forward hooks) on the same image and saving the same keys;
key naming below mirrors the Caffe2 blob names so the mapping is mechanical.

Keys use NHWC here; a diff against an NCHW reference dump auto-transposes
4-D tensors when the channel counts disagree in the NHWC position.
"""

import argparse
import sys

import _init_paths  # noqa: F401

import numpy as np

from detectron_tpu.core.config import (
    assert_and_infer_cfg, cfg, merge_cfg_from_file, merge_cfg_from_list)
from detectron_tpu.utils.logging import setup_logging

logger = setup_logging(__name__)


def dump_stages(params, im):
    """Run the full detection pipeline on ONE image, returning an ordered
    dict of per-stage numpy activations (float32)."""
    import jax
    import jax.numpy as jnp

    from detectron_tpu.core import test as test_core
    from detectron_tpu.core import test_aug
    from detectron_tpu.models import model_builder as mb
    from detectron_tpu.models import resnet
    from detectron_tpu.models import fpn as fpn_mod

    blob, scale, im_info = test_aug._prep(im, cfg.TEST.SCALE,
                                          cfg.TEST.MAX_SIZE)
    stages = {"data": blob.astype(np.float32), "im_scale": np.float32(scale)}

    spec = mb.build_spec()

    def staged_forward(params, images, im_info):
        out = {}
        dtype = (jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16"
                 else jnp.float32)
        x = images.astype(dtype)
        body_outs = resnet.apply_body(params["body"], x, spec.num_stages)
        for i, o in enumerate(body_outs):
            out["res{}".format(i + 2)] = o
        if spec.is_fpn:
            features, scales = fpn_mod.apply_fpn(params["fpn"], body_outs)
            for f, s in zip(features, scales):
                lvl = int(round(np.log2(1.0 / s)))
                out["fpn_p{}".format(lvl)] = f
        else:
            features, scales = [body_outs[-1]], [1.0 / 16.0]
        rpn_outs = mb.forward_rpn(params, features)
        for li, (cl, bp) in enumerate(rpn_outs):
            out["rpn_cls_logits_l{}".format(li)] = cl
            out["rpn_bbox_pred_l{}".format(li)] = bp
        rois, roi_scores, roi_valid = mb.generate_proposals(
            rpn_outs, features, im_info, training=False)
        out["rpn_rois"] = rois
        out["rpn_roi_scores"] = roi_scores
        out["rpn_roi_valid"] = roi_valid
        pooled = mb.roi_feature_transform(
            params, features, scales, rois,
            cfg.FAST_RCNN.ROI_XFORM_RESOLUTION,
            cfg.FAST_RCNN.ROI_XFORM_SAMPLING_RATIO)
        out["roi_feat"] = pooled
        cls_logits, bbox_pred, box_feat = mb.forward_box_outputs(
            params, features, scales, rois)
        out["box_head_feat"] = box_feat
        out["cls_prob"] = jax.nn.softmax(
            cls_logits.astype(jnp.float32), axis=-1)
        out["bbox_pred"] = bbox_pred
        det = test_core._detect_tail(params, features, scales, rois,
                                     roi_valid, im_info)
        for k, v in det.items():
            out["det_" + k] = v
        return out

    fn = jax.jit(staged_forward)
    outs = fn(params, jnp.asarray(blob), jnp.asarray(im_info))
    for k, v in outs.items():
        stages[k] = np.asarray(v, np.float32)
    return stages


def _load_params(args):
    import jax

    from detectron_tpu.models import model_builder as mb

    params = mb.init_model(jax.random.PRNGKey(args.seed))
    if args.pkl:
        from detectron_tpu.utils import detectron_weight_helper as dwh
        params = dwh.load_detectron_weight(params, args.pkl,
                                           strict=not args.lenient)
        logger.info("loaded Detectron pkl %s", args.pkl)
    elif args.ckpt:
        from detectron_tpu.utils import net as net_utils
        params = net_utils.load_ckpt_params(args.ckpt, params)
        logger.info("loaded checkpoint %s", args.ckpt)
    else:
        logger.info("no weights given: dumping from random init (seed %d)",
                    args.seed)
    return params


def _maybe_nhwc(a, b):
    """Transpose `b` NCHW->NHWC if that makes it match `a`'s shape."""
    if a.ndim == 4 and b.ndim == 4 and a.shape != b.shape and \
            a.shape == (b.shape[0], b.shape[2], b.shape[3], b.shape[1]):
        return np.transpose(b, (0, 2, 3, 1))
    return b


def diff_dumps(path_a, path_b, rtol):
    a = np.load(path_a)
    b = np.load(path_b)
    keys_a, keys_b = set(a.files), set(b.files)
    shared = [k for k in a.files if k in keys_b]
    only_a = sorted(keys_a - keys_b)
    only_b = sorted(keys_b - keys_a)
    if only_a:
        print("only in {}: {}".format(path_a, only_a))
    if only_b:
        print("only in {}: {}".format(path_b, only_b))

    print("{:<24} {:>14} {:>12} {:>12} {:>8}".format(
        "stage", "shape", "max_abs", "rel", "ok"))
    worst = 0.0
    failed = []
    for k in shared:
        ta = np.asarray(a[k], np.float32)
        tb = _maybe_nhwc(ta, np.asarray(b[k], np.float32))
        if ta.shape != tb.shape:
            print("{:<24} SHAPE MISMATCH {} vs {}".format(
                k, ta.shape, tb.shape))
            failed.append(k)
            continue
        d = np.abs(ta - tb)
        max_abs = float(d.max()) if d.size else 0.0
        denom = float(np.abs(ta).max()) if ta.size else 1.0
        rel = max_abs / max(denom, 1e-12)
        ok = rel <= rtol
        worst = max(worst, rel)
        if not ok:
            failed.append(k)
        print("{:<24} {:>14} {:>12.3e} {:>12.3e} {:>8}".format(
            k, str(ta.shape), max_abs, rel, "ok" if ok else "FAIL"))
    print("worst rel diff: {:.3e} (tolerance {:.1e})".format(worst, rtol))
    if failed:
        print("DIVERGED at: first failing stage = {!r} — inspect upstream "
              "of it.".format(failed[0]))
    return 1 if failed else 0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", dest="cfg_file")
    p.add_argument("--pkl", help="Detectron model-zoo weights .pkl")
    p.add_argument("--ckpt", help="detectron_tpu checkpoint dir/npz")
    p.add_argument("--image", help="image file (decoded with cv2, BGR)")
    p.add_argument("--out", help="output .npz dump path")
    p.add_argument("--diff", nargs=2, metavar=("A", "B"),
                   help="diff two dumps instead of dumping")
    p.add_argument("--rtol", type=float, default=3e-2,
                   help="per-stage relative tolerance for --diff "
                        "(bf16 compute => ~1e-2 scale noise)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--lenient", action="store_true",
                   help="allow missing blobs in the pkl")
    p.add_argument("--set", dest="set_cfgs", nargs="+", default=[])
    args = p.parse_args()

    if args.diff:
        sys.exit(diff_dumps(args.diff[0], args.diff[1], args.rtol))

    assert args.cfg_file and args.out, "--cfg and --out required for dump"
    merge_cfg_from_file(args.cfg_file)
    if args.set_cfgs:
        merge_cfg_from_list(args.set_cfgs)
    assert_and_infer_cfg(make_immutable=False)

    if args.image:
        import cv2
        im = cv2.imread(args.image)
        assert im is not None, "failed to read " + args.image
    else:
        logger.info("no --image: synthetic deterministic image")
        rng = np.random.RandomState(7)
        im = (rng.rand(480, 640, 3) * 255).astype(np.uint8)

    params = _load_params(args)
    stages = dump_stages(params, im)
    np.savez_compressed(args.out, **stages)
    logger.info("wrote %d stages to %s", len(stages), args.out)
    for k in stages:
        v = stages[k]
        logger.info("  %-24s %s", k, getattr(v, "shape", v))


if __name__ == "__main__":
    main()
