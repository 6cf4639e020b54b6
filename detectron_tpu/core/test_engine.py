"""Dataset inference engine.

Rebuilds lib/core/test_engine.py (run_inference, test_net_on_dataset,
test_net, initialize_model_from_cfg, empty_results, extend_results) on the
jitted detection graph:

- Images are bucketed by orientation into static canvases; each bucket is a
  single compiled program (two compiles total per config).
- The whole batch pipeline (backbone .. per-class NMS .. mask/keypoint heads)
  runs on device; the host only pastes masks / decodes keypoints for the
  <= DETECTIONS_PER_IM survivors and fills the all_boxes structures.
- Multi-chip eval shards the batch over the mesh (parallel/mesh.py) —
  replacing the reference's per-GPU subprocess sharding
  (lib/utils/subprocess.py :: process_in_parallel).
"""

import logging
import os
import pickle
import time
from collections import defaultdict

import numpy as np

from detectron_tpu.core.config import cfg
from detectron_tpu.core import test as test_ops
from detectron_tpu.data import rle as mask_util
from detectron_tpu.utils import blob as blob_utils
from detectron_tpu.utils import boxes as box_utils
from detectron_tpu.utils.timer import Timer

logger = logging.getLogger(__name__)


def initialize_model_from_cfg(args=None, seed=0):
    """Build params per cfg; load weights if paths are given."""
    import jax

    from detectron_tpu.models import model_builder as mb

    params = mb.init_model(jax.random.PRNGKey(seed))
    load_ckpt = getattr(args, "load_ckpt", None) if args else None
    load_detectron = getattr(args, "load_detectron", None) if args else None
    if load_ckpt:
        from detectron_tpu.utils import net as net_utils

        params = net_utils.load_ckpt_params(load_ckpt, params)
    if load_detectron:
        from detectron_tpu.utils import detectron_weight_helper as dwh

        params = dwh.load_detectron_weight(params, load_detectron)
    return params


def empty_results(num_classes, num_images):
    all_boxes = [[[] for _ in range(num_images)] for _ in range(num_classes)]
    all_segms = [[[] for _ in range(num_images)] for _ in range(num_classes)]
    all_keyps = [[[] for _ in range(num_images)] for _ in range(num_classes)]
    return all_boxes, all_segms, all_keyps


def extend_results(index, all_res, im_res):
    for j in range(1, len(im_res)):
        all_res[j][index] = im_res[j]


def segm_results(det_boxes, det_classes, mask_probs, im_h, im_w):
    """Paste per-detection MxM mask probabilities into the full image and
    RLE-encode (reference: lib/core/test.py :: segm_results — expand box by
    (M+2)/M, resize, binarize at MRCNN.THRESH_BINARIZE, paste)."""
    import cv2

    M = mask_probs.shape[1]
    scale = (M + 2.0) / M
    ref_boxes = box_utils.expand_boxes(det_boxes, scale)
    ref_boxes = ref_boxes.astype(np.int32)
    padded_mask = np.zeros((M + 2, M + 2), np.float32)
    rles = []
    for i in range(det_boxes.shape[0]):
        padded_mask[1:-1, 1:-1] = mask_probs[i]
        ref_box = ref_boxes[i]
        w = ref_box[2] - ref_box[0] + 1
        h = ref_box[3] - ref_box[1] + 1
        w = np.maximum(w, 1)
        h = np.maximum(h, 1)
        mask = cv2.resize(padded_mask, (w, h))
        mask = np.array(mask > cfg.MRCNN.THRESH_BINARIZE, np.uint8)
        x_0 = max(ref_box[0], 0)
        x_1 = min(ref_box[2] + 1, im_w)
        y_0 = max(ref_box[1], 0)
        y_1 = min(ref_box[3] + 1, im_h)
        # O(crop) encode: run boundaries only exist inside the crop, so the
        # full-image canvas paste (reference behavior, O(im_h*im_w) per
        # detection) is skipped entirely — bit-identical RLE.
        rles.append(mask_util.encode_crop(
            mask[(y_0 - ref_box[1]):(y_1 - ref_box[1]),
                 (x_0 - ref_box[0]):(x_1 - ref_box[0])],
            x_0, y_0, im_h, im_w))
    return rles


def keypoint_results(det_boxes, kps_heatmaps):
    """Decode keypoint heatmaps to image-coordinate predictions (reference:
    lib/core/test.py :: keypoint_results)."""
    from detectron_tpu.utils import keypoints as kp_utils

    # heatmaps: (D, S, S, K) -> (D, K, S, S)
    maps = np.transpose(kps_heatmaps, (0, 3, 1, 2))
    return kp_utils.heatmaps_to_keypoints(maps, det_boxes)


def device_outputs_to_image_results(out, bi, im_info, num_classes):
    """Convert detect_graph outputs for image `bi` into the reference's
    per-class results (cls_boxes, cls_segms, cls_keyps)."""
    valid = np.asarray(out["valid"][bi])
    boxes = np.asarray(out["boxes"][bi])[valid]
    scores = np.asarray(out["scores"][bi])[valid]
    classes = np.asarray(out["classes"][bi])[valid]
    scale = float(im_info[bi][2])
    boxes_orig = boxes / scale

    cls_boxes = [np.zeros((0, 5), np.float32) for _ in range(num_classes)]
    for j in range(1, num_classes):
        sel = classes == j
        cls_boxes[j] = np.hstack(
            [boxes_orig[sel], scores[sel, None]]).astype(np.float32)

    cls_segms = None
    if "mask_probs" in out:
        im_h = int(round(im_info[bi][0] / scale))
        im_w = int(round(im_info[bi][1] / scale))
        probs = np.asarray(out["mask_probs"][bi])[valid]
        rles = segm_results(boxes_orig, classes, probs, im_h, im_w)
        cls_segms = [[] for _ in range(num_classes)]
        for r, j in zip(rles, classes):
            cls_segms[j].append(r)

    cls_keyps = None
    if "kps_heatmaps" in out:
        hm = np.asarray(out["kps_heatmaps"][bi])[valid]
        xy = keypoint_results(boxes_orig, hm)
        cls_keyps = [[] for _ in range(num_classes)]
        for k_i, j in enumerate(classes):
            cls_keyps[j].append(xy[k_i])
    return cls_boxes, cls_segms, cls_keyps


def _flagged_host_path():
    """True when any test-time flag needs the host im_detect_all path:
    TTA, Soft-NMS, or box voting (reference: these are always applied in
    lib/core/test_engine.py :: test_net -> im_detect_all)."""
    return (cfg.TEST.BBOX_AUG.ENABLED or cfg.TEST.MASK_AUG.ENABLED
            or cfg.TEST.KPS_AUG.ENABLED or cfg.TEST.SOFT_NMS.ENABLED
            or cfg.TEST.BBOX_VOTE.ENABLED)


def test_net_im_detect_all(params, roidb_entries, dataset, output_dir=None):
    """Per-image eval through core/test.py :: im_detect_all — the path that
    honors TEST.BBOX_AUG / MASK_AUG / KPS_AUG / SOFT_NMS / BBOX_VOTE
    (reference: lib/core/test_engine.py :: test_net routes every image
    through im_detect_all)."""
    import cv2
    import jax

    num_images = len(roidb_entries)
    num_classes = cfg.MODEL.NUM_CLASSES
    all_boxes, all_segms, all_keyps = empty_results(num_classes, num_images)
    fns = {
        "detect_raw": jax.jit(test_ops.detect_raw),
        "mask_on_boxes": jax.jit(test_ops.mask_on_boxes_graph),
        "kps_on_boxes": jax.jit(test_ops.kps_on_boxes_graph),
    }
    timers = defaultdict(Timer)
    for idx, entry in enumerate(roidb_entries):
        im = cv2.imread(entry["image"])
        timers["im_detect_all"].tic()
        cls_boxes, cls_segms, cls_keyps = test_ops.im_detect_all(
            params, im, fns, timers)
        timers["im_detect_all"].toc()
        extend_results(idx, all_boxes, cls_boxes)
        if cls_segms is not None:
            extend_results(idx, all_segms, cls_segms)
        if cls_keyps is not None:
            extend_results(idx, all_keyps, cls_keyps)
        if idx % 50 == 0:
            logger.info("im_detect_all: %d/%d (%.3fs/im)", idx + 1,
                        num_images, timers["im_detect_all"].average_time)

    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        det_file = os.path.join(output_dir, "detections.pkl")
        with open(det_file, "wb") as f:
            pickle.dump(
                dict(all_boxes=all_boxes, all_segms=all_segms,
                     all_keyps=all_keyps, cfg=str(cfg)), f,
                pickle.HIGHEST_PROTOCOL)
        logger.info("Wrote detections to: %s", os.path.abspath(det_file))
    return all_boxes, all_segms, all_keyps


def test_net(params, roidb_entries, dataset, batch_size=8, output_dir=None,
             detect_fn=None):
    """Run detection over a list of roidb entries. Returns all_boxes/segms/
    keyps in the reference's [cls][img] structure."""
    import cv2
    import jax
    import jax.numpy as jnp

    if detect_fn is None and _flagged_host_path():
        return test_net_im_detect_all(params, roidb_entries, dataset,
                                      output_dir=output_dir)

    num_images = len(roidb_entries)
    num_classes = cfg.MODEL.NUM_CLASSES
    all_boxes, all_segms, all_keyps = empty_results(num_classes, num_images)

    use_props = cfg.TEST.PRECOMPUTED_PROPOSALS
    if detect_fn is None:
        graph = test_ops.detect_graph_with_proposals if use_props \
            else test_ops.detect_graph
        n_dev = len(jax.devices())
        if n_dev > 1 and batch_size % n_dev == 0:
            # Mesh-sharded eval: the batch splits across chips, params
            # replicate — the reference's per-GPU subprocess sharding
            # (lib/utils/subprocess.py) as one SPMD program.
            from jax.sharding import NamedSharding, PartitionSpec as P

            from detectron_tpu.parallel import mesh as mesh_mod

            mesh = mesh_mod.make_mesh()
            repl = NamedSharding(mesh, P())
            data = NamedSharding(mesh, P("data"))
            n_batch_args = 3 if use_props else 2
            detect_fn = jax.jit(
                graph,
                in_shardings=(repl,) + (data,) * n_batch_args
                + ((data,) if use_props else ()),
            )
        else:
            detect_fn = jax.jit(graph)

    timers = defaultdict(Timer)
    # Pre-create: im_load ticks on the loader thread; defaultdict insertion
    # is not thread-safe against the main thread's timer lookups.
    for k in ("im_load", "device_wait", "misc"):
        timers[k]

    # Bucket images by orientation to keep canvases static.
    buckets = {"landscape": [], "portrait": []}
    for idx, entry in enumerate(roidb_entries):
        key = "landscape" if entry["width"] >= entry["height"] else "portrait"
        buckets[key].append(idx)
    batches = [(key, indices[s:s + batch_size])
               for key, indices in buckets.items()
               for s in range(0, len(indices), batch_size)]

    R = cfg.TEST.PROPOSAL_LIMIT if use_props else 0

    def _prepare(key, chunk):
        """All host-side input work for one batch (cv2 decode/resize/pad)."""
        timers["im_load"].tic()
        blobs, infos, prop_boxes, prop_valid = [], [], [], []
        canvas = blob_utils.static_canvas(
            cfg.TEST.SCALE, cfg.TEST.MAX_SIZE, key == "landscape")
        for idx in chunk:
            entry = roidb_entries[idx]
            im = cv2.imread(entry["image"])
            prepped, scale = blob_utils.prep_im_for_blob(
                im, cfg.PIXEL_MEANS, cfg.TEST.SCALE, cfg.TEST.MAX_SIZE)
            blobs.append(prepped)
            infos.append([prepped.shape[0], prepped.shape[1], scale])
            if use_props:
                boxes = entry["boxes"][entry["gt_classes"] == 0] * scale
                if cfg.DEDUP_BOXES > 0:
                    keep = box_utils.unique_boxes(boxes, cfg.DEDUP_BOXES)
                    boxes = boxes[keep]
                boxes = boxes[:R]
                pad = np.zeros((R, 4), np.float32)
                pad[: len(boxes)] = boxes
                prop_boxes.append(pad)
                v = np.zeros(R, bool)
                v[: len(boxes)] = True
                prop_valid.append(v)
        while len(blobs) < batch_size:
            blobs.append(None)  # zero pad row, already zeroed below
            infos.append([canvas[0], canvas[1], 1.0])
            if use_props:
                prop_boxes.append(np.zeros((R, 4), np.float32))
                prop_valid.append(np.zeros(R, bool))
        # Preallocate + fill (and cast to the graph's compute dtype on the
        # host): no list+np.stack copy of the ~200 MB batch, and bf16
        # halves the host->device transfer — the graph's first conv casts
        # to the compute dtype anyway, so numerics are identical (same as
        # bench.py's bf16 feed). Both matter on this environment's 1-core
        # host + ~100 MB/s tunnel.
        in_dtype = np.float32
        if cfg.TPU.COMPUTE_DTYPE == "bfloat16":
            import ml_dtypes
            in_dtype = ml_dtypes.bfloat16
        images_np = np.zeros((batch_size,) + tuple(canvas) + (3,), in_dtype)
        for i, b in enumerate(blobs):
            if b is not None:
                assert b.shape[0] <= canvas[0] and b.shape[1] <= canvas[1], (
                    "prepped image %s exceeds static canvas %s"
                    % (b.shape[:2], tuple(canvas)))
                images_np[i, :b.shape[0], :b.shape[1]] = b
        if cfg.TPU.S2D_INPUT:
            images_np = blob_utils.space_to_depth(images_np)
        timers["im_load"].toc()
        return chunk, images_np, infos, prop_boxes, prop_valid

    # Three-way overlap: a loader thread does the cv2 input work for batch
    # k+1, the device computes batch k (async jit dispatch), and the host
    # post-processes batch k-1 (mask paste / keypoint decode, parallelized
    # over the batch — cv2 and the native RLE encoder release the GIL).
    # The reference overlaps nothing; its per-image loop serializes load,
    # forward, and paste (lib/core/test_engine.py :: test_net).
    import queue as queue_mod
    import threading
    from concurrent.futures import ThreadPoolExecutor

    prep_q = queue_mod.Queue(maxsize=2)

    def _loader():
        try:
            for key, chunk in batches:
                prep_q.put(("ok", _prepare(key, chunk)))
            prep_q.put(("done", None))
        except BaseException as e:  # surface in the consumer
            prep_q.put(("err", e))

    loader = threading.Thread(target=_loader, daemon=True)
    loader.start()

    # Post-processing pool sized to the host: more threads than cores just
    # adds GIL/switching overhead to the loader thread it must overlap with
    # (this environment's eval host has nproc=1 — see PERF.md round-5
    # eval-loop notes for the measured single-core ceiling).
    post_pool = ThreadPoolExecutor(
        max(1, min(int(cfg.DATA_LOADER.NUM_THREADS),
                   os.cpu_count() or 1)))

    def _post(chunk, infos, out):
        timers["device_wait"].tic()
        out = jax.tree.map(np.asarray, out)  # sync point for this batch
        timers["device_wait"].toc()
        timers["misc"].tic()

        def one(bi_idx):
            bi, idx = bi_idx
            return idx, device_outputs_to_image_results(
                out, bi, infos, num_classes)

        for idx, (cls_boxes, cls_segms, cls_keyps) in post_pool.map(
                one, list(enumerate(chunk))):
            extend_results(idx, all_boxes, cls_boxes)
            if cls_segms is not None:
                extend_results(idx, all_segms, cls_segms)
            if cls_keyps is not None:
                extend_results(idx, all_keyps, cls_keyps)
        timers["misc"].toc()

    t_wall = Timer()
    t_wall.tic()
    n_done = 0
    n_first = 0
    t_first_done = None
    pending = None
    while True:
        tag, item = prep_q.get()
        if tag == "err":
            raise item
        if tag == "done":
            break
        chunk, images_np, infos, prop_boxes, prop_valid = item
        if use_props:
            out = detect_fn(
                params, jnp.asarray(images_np),
                jnp.asarray(np.array(infos, np.float32)),
                jnp.asarray(np.stack(prop_boxes)),
                jnp.asarray(np.stack(prop_valid)))
        else:
            out = detect_fn(params, jnp.asarray(images_np),
                            jnp.asarray(np.array(infos, np.float32)))
        if pending is not None:
            _post(*pending)
            if t_first_done is None:
                # First batch consumed: everything before this point is
                # dominated by the one-off XLA compile (the persistent
                # cache makes reruns skip it); the steady rate below
                # excludes it.
                t_first_done = time.time()
                n_first = n_done
        pending = (chunk, infos, out)
        n_done += len(chunk)
        if n_done % (batch_size * 8) < batch_size:
            logger.info(
                "test_net: %d/%d | load %.3fs, device wait %.3fs, "
                "post %.3fs per batch", n_done, num_images,
                timers["im_load"].average_time,
                timers["device_wait"].average_time,
                timers["misc"].average_time)
    if pending is not None:
        _post(*pending)
    loader.join()
    post_pool.shutdown()
    t_wall.toc()
    if num_images:
        logger.info("test_net: %d images in %.1fs (%.2f img/s end-to-end)",
                    num_images, t_wall.total_time,
                    num_images / max(t_wall.total_time, 1e-9))
        if t_first_done is not None and num_images > n_first:
            steady = time.time() - t_first_done
            logger.info(
                "test_net: steady state %.2f img/s (%d images in %.1fs, "
                "first batch + compile excluded)",
                (num_images - n_first) / max(steady, 1e-9),
                num_images - n_first, steady)

    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        det_file = os.path.join(output_dir, "detections.pkl")
        with open(det_file, "wb") as f:
            pickle.dump(
                dict(all_boxes=all_boxes, all_segms=all_segms,
                     all_keyps=all_keyps, cfg=str(cfg)), f,
                pickle.HIGHEST_PROTOCOL)
        logger.info("Wrote detections to: %s", os.path.abspath(det_file))
    return all_boxes, all_segms, all_keyps


def run_inference(args, dataset_name=None, output_dir=None, batch_size=8,
                  check_expected_results=False, ind_range=None):
    """Top-level: build model, run test_net over the dataset, evaluate.

    ind_range=(start, end): evaluate only images [start, end) and write
    detection_range_{start}_{end}.pkl without dataset evaluation — the
    reference's child-subprocess contract (lib/core/test_engine.py ::
    test_net with ind_range).
    """
    from detectron_tpu.data import task_evaluation
    from detectron_tpu.data.json_dataset import JsonDataset

    dataset_name = dataset_name or cfg.TEST.DATASETS[0]
    dataset = JsonDataset(dataset_name)
    proposal_file = None
    if cfg.TEST.PRECOMPUTED_PROPOSALS and cfg.TEST.PROPOSAL_FILES:
        proposal_file = cfg.TEST.PROPOSAL_FILES[0]
    roidb = dataset.get_roidb(gt=True, proposal_file=proposal_file,
                              proposal_limit=cfg.TEST.PROPOSAL_LIMIT)
    params = initialize_model_from_cfg(args)
    if ind_range is not None:
        start, end = int(ind_range[0]), int(ind_range[1])
        assert 0 <= start < end <= len(roidb), \
            "--range {} out of bounds for {} images".format(
                ind_range, len(roidb))
        sub = roidb[start:end]
        all_boxes, all_segms, all_keyps = test_net(
            params, sub, dataset, batch_size=batch_size, output_dir=None)
        if output_dir:
            os.makedirs(output_dir, exist_ok=True)
            det_file = os.path.join(
                output_dir,
                "detection_range_{}_{}.pkl".format(start, end))
            with open(det_file, "wb") as f:
                pickle.dump(
                    dict(all_boxes=all_boxes, all_segms=all_segms,
                         all_keyps=all_keyps, start=start, end=end,
                         cfg=str(cfg)), f, pickle.HIGHEST_PROTOCOL)
            logger.info("Wrote range detections to: %s",
                        os.path.abspath(det_file))
        logger.info("ind_range given: skipping dataset evaluation "
                    "(partial results; reference child-subprocess contract)")
        return None
    all_boxes, all_segms, all_keyps = test_net(
        params, roidb, dataset, batch_size=batch_size, output_dir=output_dir)
    results = task_evaluation.evaluate_all(
        dataset, all_boxes, all_segms, all_keyps, output_dir or ".")
    if check_expected_results:
        task_evaluation.check_expected_results(
            results, atol=cfg.EXPECTED_RESULTS_ATOL,
            rtol=cfg.EXPECTED_RESULTS_RTOL)
    return results
