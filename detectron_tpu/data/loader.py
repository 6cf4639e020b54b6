"""Training data loader: host-side decode/resize/pad ONLY.

Replaces lib/roi_data/loader.py (RoiDataLoader, MinibatchSampler,
collate_minibatch) and lib/roi_data/minibatch.py — but deliberately does
LESS: the reference's loader also runs all target assignment in numpy
(anchor labels, RoI sampling, mask rasterization per sampled RoI); here
targets are computed in-graph (models/targets.py), so the host only:

1. reads + decodes the image (cv2), flips if the entry says so,
2. random-scale resize (TRAIN.SCALES) with MAX_SIZE cap,
3. zero-pads into the static orientation-bucket canvas,
4. pads gt boxes/classes/masks/keypoints to static shapes,
5. rasterizes each gt's polygons ONCE into a fixed (GT_MASK_SIZE)^2 crop of
   its own box (the in-graph mask-target op crop-resizes these per sampled
   RoI).

Batches are aspect-grouped (all-landscape or all-portrait) so each bucket
compiles once. A background thread pool prefetches.
"""

import queue
import threading

import cv2
import numpy as np

from detectron_tpu.core.config import cfg
from detectron_tpu.utils import blob as blob_utils
from detectron_tpu.utils import segms as segm_utils


def load_image(entry):
    im = cv2.imread(entry["image"])
    assert im is not None, "Failed to read " + entry["image"]
    if entry.get("flipped", False):
        im = im[:, ::-1, :]
    return im


def make_minibatch(entries, rng):
    """entries: list of roidb entries (same orientation). Returns the batch
    dict consumed by models/train_graph.training_losses."""
    B = len(entries)
    scale_idx = rng.randint(0, len(cfg.TRAIN.SCALES))
    target_size = cfg.TRAIN.SCALES[scale_idx]
    max_size = cfg.TRAIN.MAX_SIZE
    G = cfg.TPU.MAX_GT_BOXES
    Kc = max(1, cfg.TPU.MAX_GT_BOXES // 4)
    Mg = cfg.TPU.GT_MASK_SIZE

    landscape = entries[0]["width"] >= entries[0]["height"]
    canvas = blob_utils.static_canvas(target_size, max_size, landscape)

    images = np.zeros((B,) + canvas + (3,), np.float32)
    im_info = np.zeros((B, 3), np.float32)
    gt_boxes = np.zeros((B, G, 4), np.float32)
    gt_classes = np.zeros((B, G), np.int32)
    gt_valid = np.zeros((B, G), bool)
    crowd_boxes = np.zeros((B, Kc, 4), np.float32)
    crowd_valid = np.zeros((B, Kc), bool)
    if cfg.MODEL.MASK_ON:
        gt_masks = np.zeros((B, G, Mg, Mg), np.float32)
    if cfg.MODEL.KEYPOINTS_ON:
        nk = cfg.KRCNN.NUM_KEYPOINTS
        gt_keypoints = np.zeros((B, G, nk, 3), np.float32)
    # Fast R-CNN mode (RPN off, TRAIN.PROPOSAL_FILES): feed the entry's
    # precomputed proposals (reference: lib/roi_data/minibatch.py ::
    # get_minibatch non-RPN branch).
    use_prop = not cfg.RPN.RPN_ON
    if use_prop:
        Rp = cfg.TPU.MAX_TRAIN_PROPOSALS
        proposals = np.zeros((B, Rp, 4), np.float32)
        prop_valid = np.zeros((B, Rp), bool)

    for i, entry in enumerate(entries):
        im = load_image(entry)
        prepped, scale = blob_utils.prep_im_for_blob(
            im, cfg.PIXEL_MEANS, target_size, max_size)
        images[i] = blob_utils.im_to_canvas(prepped, canvas)
        im_info[i] = [prepped.shape[0], prepped.shape[1], scale]

        is_crowd = entry["is_crowd"]
        gt_inds = np.where((entry["gt_classes"] > 0) & ~is_crowd)[0][:G]
        crowd_inds = np.where(is_crowd)[0][:Kc]
        n = len(gt_inds)
        gt_boxes[i, :n] = entry["boxes"][gt_inds] * scale
        gt_classes[i, :n] = entry["gt_classes"][gt_inds]
        gt_valid[i, :n] = True
        nc = len(crowd_inds)
        crowd_boxes[i, :nc] = entry["boxes"][crowd_inds] * scale
        crowd_valid[i, :nc] = True

        if use_prop:
            # Proposals are the entry boxes with gt_classes == 0 (merged
            # from the proposal file by json_dataset).
            p_inds = np.where(entry["gt_classes"] == 0)[0][:Rp]
            npr = len(p_inds)
            proposals[i, :npr] = entry["boxes"][p_inds] * scale
            prop_valid[i, :npr] = True

        if cfg.MODEL.MASK_ON:
            for j, gi in enumerate(gt_inds):
                segm = entry["segms"][gi]
                box = entry["boxes"][gi]  # unscaled coords; masks are
                # rasterized wrt the unscaled box, which is scale-invariant.
                if segm_utils.is_poly(segm) and len(segm) > 0:
                    gt_masks[i, j] = segm_utils.polys_to_mask_wrt_box(
                        segm, box, Mg)
                elif isinstance(segm, dict):
                    from detectron_tpu.data import rle as mask_util
                    full = mask_util.decode(segm).astype(np.float32)
                    x1, y1, x2, y2 = [int(round(v)) for v in box]
                    crop = full[y1:y2 + 1, x1:x2 + 1]
                    if crop.size:
                        gt_masks[i, j] = cv2.resize(
                            crop, (Mg, Mg),
                            interpolation=cv2.INTER_LINEAR)

        if cfg.MODEL.KEYPOINTS_ON and "gt_keypoints" in entry:
            kps = entry["gt_keypoints"][gt_inds]  # (n, 3, K)
            gt_keypoints[i, :n] = np.transpose(kps, (0, 2, 1)) * \
                np.array([scale, scale, 1.0], np.float32)

    if cfg.TPU.S2D_INPUT:
        # Host-side space-to-depth: the stem conv consumes blocked input
        # directly (models/resnet._s2d_blocked_stem_conv).
        images = blob_utils.space_to_depth(images)
    batch = {
        "images": images,
        "im_info": im_info,
        "gt_boxes": gt_boxes,
        "gt_classes": gt_classes,
        "gt_valid": gt_valid,
        "crowd_boxes": crowd_boxes,
        "crowd_valid": crowd_valid,
    }
    if cfg.MODEL.MASK_ON:
        batch["gt_masks"] = gt_masks
    if cfg.MODEL.KEYPOINTS_ON:
        batch["gt_keypoints"] = gt_keypoints
    if use_prop:
        batch["proposals"] = proposals
        batch["prop_valid"] = prop_valid
    return batch


class TrainLoader:
    """Shuffled, aspect-grouped, prefetching minibatch iterator.

    Replaces RoiDataLoader + MinibatchSampler + collate_minibatch. No
    per-GPU chunked lists — the pjit'd step takes the whole global batch and
    the mesh shards it.
    """

    def __init__(self, roidb, batch_size, seed=None, prefetch=4,
                 num_threads=None, start_batch=0):
        self.roidb = roidb
        self.batch_size = batch_size
        self.rng = np.random.RandomState(
            cfg.RNG_SEED if seed is None else seed)
        self.num_threads = num_threads or cfg.DATA_LOADER.NUM_THREADS
        self._q = queue.Queue(maxsize=prefetch)
        self._order = None
        self._stop = threading.Event()
        self._threads = []
        self._lock = threading.Lock()
        self._cursor = 0
        self._next_ticket = 0
        self._deliver_ticket = 0
        self._reorder = {}
        self._epoch_order()
        if start_batch:
            self._fast_forward(start_batch)
        for _ in range(max(1, self.num_threads)):
            t = threading.Thread(target=self._worker, daemon=True)
            t.start()
            self._threads.append(t)

    def _fast_forward(self, n):
        """Advance the sampler past n already-consumed batches (exact
        `--resume`): the stream state is fully determined by (seed, batches
        consumed), so replaying the epoch shuffles and per-batch seed draws
        — without building any minibatch — reproduces the uninterrupted
        run's data order from batch n on. The reference's loader (and a
        plain re-init here) restarts its stream from epoch start instead,
        so resumed runs saw different data than uninterrupted ones."""
        for _ in range(n):
            if self._cursor >= len(self._order):
                self._epoch_order()
            self._cursor += 1
            self.rng.randint(0, 2**31 - 1)

    def _epoch_order(self):
        if cfg.TRAIN.ASPECT_GROUPING:
            landscape = [i for i, e in enumerate(self.roidb)
                         if e["width"] >= e["height"]]
            portrait = [i for i, e in enumerate(self.roidb)
                        if e["width"] < e["height"]]
            self.rng.shuffle(landscape)
            self.rng.shuffle(portrait)
            batches = []
            for group in (landscape, portrait):
                for s in range(0, len(group) - self.batch_size + 1,
                               self.batch_size):
                    batches.append(group[s:s + self.batch_size])
            self.rng.shuffle(batches)
            self._order = batches
        else:
            idx = np.arange(len(self.roidb))
            self.rng.shuffle(idx)
            n = (len(idx) // self.batch_size) * self.batch_size
            self._order = [list(idx[s:s + self.batch_size])
                           for s in range(0, n, self.batch_size)]
        self._cursor = 0

    def _next_batch_indices(self):
        with self._lock:
            if self._cursor >= len(self._order):
                self._epoch_order()
            batch = self._order[self._cursor]
            self._cursor += 1
            seed = int(self.rng.randint(0, 2**31 - 1))
            ticket = self._next_ticket
            self._next_ticket += 1
        return batch, seed, ticket

    def _worker(self):
        while not self._stop.is_set():
            idxs, seed, ticket = self._next_batch_indices()
            entries = [self.roidb[i] for i in idxs]
            batch = make_minibatch(entries, np.random.RandomState(seed))
            while not self._stop.is_set():
                try:
                    self._q.put((ticket, batch), timeout=0.5)
                    break
                except queue.Full:
                    continue

    def __next__(self):
        # Deliver strictly in ticket (= sampler cursor) order: whichever
        # thread finishes first, the training stream is bit-reproducible
        # for a given seed at ANY num_threads (the reference's
        # multi-worker loader — and round 1 here — was order-racy). The
        # reorder buffer is bounded by prefetch + num_threads batches.
        while self._deliver_ticket not in self._reorder:
            ticket, batch = self._q.get()
            self._reorder[ticket] = batch
        batch = self._reorder.pop(self._deliver_ticket)
        self._deliver_ticket += 1
        return batch

    def __iter__(self):
        return self

    def close(self):
        self._stop.set()
