"""Pallas TPU kernel for batched greedy NMS.

Runs L independent NMS problems per grid step (lanes = images x levels, or
images x classes), each over N score-sorted boxes. The greedy recurrence is
inherently sequential in i, but each iteration suppresses against ALL later
boxes of ALL lanes at once — an (L, N) VPU op — and IoU rows are computed on
the fly (no N x N matrix in VMEM). The loop runs only to the maximum over
the block's lanes of (last valid index + 1), so mostly-empty lanes cost
nothing. That bound is hole-safe: callers may feed -inf holes mid-sequence
(e.g. min-size-filtered proposals), and every valid box still gets its turn
as pivot; invalid holes never pivot (their keep mask starts dead).

Semantics: identical to ops/nms.nms_padded with presorted=True (Detectron +1
edge convention; invalid boxes marked by -inf scores never suppress and
never survive). Verified against it in tests/test_nms.py.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(nvalid_ref, thr_ref, boxes_ref, valid_ref, keep_ref, *,
            lanes, n_boxes):
    # boxes_ref: (4, L, N) — coordinate-major so the (L, N) trailing dims
    # tile cleanly as (8, 128); an (L, N, 4) layout would pad the 4-wide
    # lane dim to 128 (32x VMEM blowup).
    x1 = boxes_ref[0]
    y1 = boxes_ref[1]
    x2 = boxes_ref[2]
    y2 = boxes_ref[3]
    area = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)
    valid = valid_ref[:, :] != 0
    thr = thr_ref[0]

    jidx = jax.lax.broadcasted_iota(jnp.int32, (lanes, n_boxes), 1)

    # Per-block loop bound: max over lanes of (last valid index + 1) —
    # NOT sum(valid), which under-iterates when invalid -inf holes sit
    # between valid boxes and would leave post-hole boxes pivotless.
    n_iter = nvalid_ref[pl.program_id(0)]

    def body(i, keep):
        # keep: (L, N) float32 {0, 1} — Mosaic loop carries legalize more
        # reliably as f32 vectors than i1 masks.
        # Load the pivot box straight from the ref (Mosaic supports dynamic
        # ref slices but not dynamic value slices).
        # Extract the pivot box via masked reduces (lane-dim dynamic
        # slices must be 128-aligned on TPU; reduces are cheap VPU ops).
        sel = jidx == i
        neg = jnp.float32(-1e30)

        def pick(v):
            return jnp.max(jnp.where(sel, v, neg), axis=1, keepdims=True)

        bx1 = pick(x1)
        by1 = pick(y1)
        bx2 = pick(x2)
        by2 = pick(y2)
        barea = (bx2 - bx1 + 1.0) * (by2 - by1 + 1.0)
        iw = jnp.maximum(
            jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1) + 1.0, 0.0)
        ih = jnp.maximum(
            jnp.minimum(y2, by2) - jnp.maximum(y1, by1) + 1.0, 0.0)
        inter = iw * ih
        iou = inter / (area + barea - inter)
        # Pivot aliveness without value dynamic-slice: masked max-reduce.
        alive = jnp.max(
            jnp.where(jidx == i, keep, 0.0), axis=1, keepdims=True)
        sup = (iou > thr) & (jidx > i) & (alive > 0.5)
        return jnp.where(sup, 0.0, keep)

    keep0 = valid.astype(jnp.float32)

    def cond(state):
        i, _ = state
        return i < n_iter

    def wbody(state):
        i, keep = state
        return i + 1, body(i, keep)

    _, keep = jax.lax.while_loop(cond, wbody, (jnp.int32(0), keep0))
    keep_ref[:, :] = (keep > 0.5).astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("lanes_per_step", "interpret"))
def nms_keep_mask(boxes, valid, thr, lanes_per_step=8, interpret=False):
    """boxes: (L, N, 4) score-DESCENDING per lane; valid: (L, N) bool;
    thr: scalar. Returns keep (L, N) bool (greedy NMS survivors).
    L must be a multiple of lanes_per_step."""
    L, N = valid.shape
    assert L % lanes_per_step == 0
    grid = (L // lanes_per_step,)
    # Per-block loop bound: max over lanes of (index of last valid box + 1).
    # Same cost as the old sum(valid) but makes no prefix assumption, so
    # lanes with -inf holes mid-sequence (min-size-filtered proposals) are
    # handled identically to the XLA fallback. SMEM only supports scalar
    # loads, so the per-block max is computed here.
    nlast = jnp.max(
        jnp.where(valid, jnp.arange(N, dtype=jnp.int32)[None, :] + 1, 0),
        axis=1).astype(jnp.int32)
    nvalid_blk = jnp.max(
        nlast.reshape(L // lanes_per_step, lanes_per_step), axis=1)
    thr_arr = jnp.asarray([thr], jnp.float32)

    kernel = functools.partial(
        _kernel, lanes=lanes_per_step, n_boxes=N)

    keep = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((4, lanes_per_step, N),
                             lambda i, nv, t: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((lanes_per_step, N), lambda i, nv, t: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((lanes_per_step, N),
                                   lambda i, nv, t: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((L, N), jnp.int32),
        interpret=interpret,
    )(nvalid_blk, thr_arr,
      jnp.transpose(boxes.astype(jnp.float32), (2, 0, 1)),
      valid.astype(jnp.int32))
    return keep != 0


def nms_many(boxes, scores, thr, max_output_size, lanes_per_step=8,
             interpret=False):
    """Batched equivalent of vmap(nms_padded(..., presorted=True)):
    boxes (L, N, 4) score-descending, scores (L, N) with -inf invalid.
    Returns (idx (L, K) int32, valid (L, K) bool)."""
    L, N = scores.shape
    pad = (-L) % lanes_per_step
    valid = jnp.isfinite(scores)
    if pad:
        boxes = jnp.pad(boxes, ((0, pad), (0, 0), (0, 0)))
        valid = jnp.pad(valid, ((0, pad), (0, 0)))
    keep = nms_keep_mask(boxes, valid, thr, lanes_per_step, interpret)[:L]

    pos = jnp.arange(N)
    key = jnp.where(keep, N - pos, 0)
    kv, sel = jax.lax.top_k(key, min(max_output_size, N))
    out_valid = kv > 0
    out_idx = jnp.where(out_valid, sel, 0)
    return out_idx.astype(jnp.int32), out_valid
