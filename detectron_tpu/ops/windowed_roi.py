"""Windowed multilevel RoIAlign: one contiguous window slice per RoI +
dense in-window interpolation matmuls. The production inference path.

Why: the pure gather formulation (ops/multilevel_roi.py) issues 4 point
gathers per bilinear sample — millions of 512-byte reads that TPUs execute
poorly (~160 ms/batch measured on v5e for Mask R-CNN R-50-FPN test shapes).
Dense per-level interpolation matmuls (ops/roi_align.py) are MXU-friendly
but do O(R * H_l * W_l) work — prohibitive at P2. This module takes the
middle path that fits the hardware:

1. All pyramid levels are stacked row-wise into ONE tall canvas
   (sum_l H'_l, W_max, C), each level zero-padded to the window size, so a
   RoI's feature neighborhood at ANY level is a single contiguous 2-D window.
2. Each RoI takes one (WIN, WIN, C) dynamic_slice — a coarse-grained block
   gather the DMA engines execute efficiently.
3. Bilinear sampling + grid averaging become two small matmuls against
   per-RoI interpolation weight matrices (exactly as ops/roi_align.py), all
   inside the window.

Exactness: the raw windowed paths are identical to Detectron RoIAlign
whenever the RoI's feature extent fits the window (true by construction of
FPN level assignment for UNCLAMPED levels: extent is ~[14, 28) cells).
RoIs clamped up to the top level have unbounded extent; the *_hybrid entry
points (the production dispatch) compute those exactly via dense whole-level
interpolation on the (tiny) top map and select per RoI — no RoI ever clamps
its samples.
"""

import functools

import jax
import jax.numpy as jnp


def _axis_weights_window(rel_coords, in_bounds, size):
    """(R, S) window-relative sample coords -> (R, S, size) bilinear weights
    (Detectron semantics; callers pre-clamp and pre-mask)."""
    c = jnp.clip(rel_coords, 0.0, size - 1.0)
    idx = jnp.arange(size, dtype=rel_coords.dtype)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(c[..., None] - idx))
    return w * in_bounds[..., None]


def build_canvas(pyramid, window):
    """Stack levels row-wise, each padded to (>=window rows, W_max + pad
    cols). Returns (canvas (Hc, Wc, C), row_offsets list, (H_l, W_l) list)."""
    C = pyramid[0].shape[-1]
    wmax = max(f.shape[1] for f in pyramid) + window
    blocks = []
    row_offsets = []
    dims = []
    r = 0
    for f in pyramid:
        H, W = f.shape[:2]
        Hp = max(H, window)
        blk = jnp.pad(f, ((0, Hp - H), (0, wmax - W), (0, 0)))
        blocks.append(blk)
        row_offsets.append(r)
        dims.append((H, W))
        r += Hp
    return jnp.concatenate(blocks, axis=0), row_offsets, dims


def window_params(rois, scales, heights, widths, row_off, pad_rows, Wc,
                  pooled, sampling_ratio, k_min, k_max, canonical_scale,
                  canonical_level, window_y, window_x, weight_dtype,
                  align_x=1, col_off=None):
    """Per-RoI window origins + interpolation weights (shared by the XLA
    dynamic_slice path and the Pallas DMA kernel).

    Returns (start_y, start_x) int32 (R,) into the stacked canvas, vy/vx
    (R, pooled, window) weights with the sampling-grid average folded in,
    and ok (R,) bool — True iff the window FULLY covers every in-bounds
    sample of the RoI (the windowed result is then bit-identical to exact
    RoIAlign). Callers use ok for rung assignment (the window-shape ladder)
    and for exact-fallback routing; a False ok means outer samples clamp at
    the window edge (bounded approximation)."""
    rois = rois.astype(jnp.float32)
    w = rois[:, 2] - rois[:, 0] + 1.0
    h = rois[:, 3] - rois[:, 1] + 1.0
    s = jnp.sqrt(jnp.maximum(w * h, 1e-12))
    lvl = jnp.clip(
        jnp.floor(canonical_level + jnp.log2(s / canonical_scale + 1e-6)),
        k_min, k_max).astype(jnp.int32) - k_min

    lvl_scale = jnp.asarray(scales, jnp.float32)[lvl]
    Hl = heights[lvl]
    Wl = widths[lvl]
    off_y = row_off[lvl]
    Hp = pad_rows[lvl]

    x1 = rois[:, 0] * lvl_scale
    y1 = rois[:, 1] * lvl_scale
    roi_w = jnp.maximum((rois[:, 2] - rois[:, 0]) * lvl_scale, 1.0)
    roi_h = jnp.maximum((rois[:, 3] - rois[:, 1]) * lvl_scale, 1.0)

    S = pooled * sampling_ratio
    p = jnp.arange(S, dtype=jnp.float32)
    bins = p // sampling_ratio
    g = p % sampling_ratio
    ys = y1[:, None] + bins[None, :] * (roi_h / pooled)[:, None] + \
        (g[None, :] + 0.5) * (roi_h / pooled)[:, None] / sampling_ratio
    xs = x1[:, None] + bins[None, :] * (roi_w / pooled)[:, None] + \
        (g[None, :] + 0.5) * (roi_w / pooled)[:, None] / sampling_ratio

    in_y = (ys >= -1.0) & (ys <= Hl[:, None])
    in_x = (xs >= -1.0) & (xs <= Wl[:, None])
    # Clamp to the level (Detectron edge rule), then express relative to the
    # window (clamping to the window edge for oversize RoIs).
    yc = jnp.clip(ys, 0.0, Hl[:, None] - 1.0)
    xc = jnp.clip(xs, 0.0, Wl[:, None] - 1.0)

    # Window start: center-ish on the RoI, clamped inside the level's padded
    # block so the slice never crosses into another level. The x start is
    # rounded down to `align_x` (TPU sublane tiling needs 8-aligned W-dim
    # DMA offsets; the extra slack is covered by a wider x window). The x
    # upper clamp is PER-LEVEL (Wl - window_x, floored at 0): when the
    # window is at least as wide as the level, wx0 pins to 0 and the
    # window covers the WHOLE level — whole-level interpolation, exact for
    # any RoI extent (the full-canvas top-level path relies on this; the
    # read never crosses levels because levels are row-stacked and
    # column-padded by >= window_x).
    # The max(0, ...) upper bounds keep origins in-range even when the
    # window exceeds the level's padded block (tall/wide ladder rungs at
    # small levels): the window then overhangs into following level rows /
    # padding columns, which carry zero weight (samples are level-clamped),
    # so overhang reads are harmless — callers only must pad the canvas
    # BOTTOM by the max window overhang (build_canvas_batched does).
    wy0 = jnp.clip(jnp.floor(y1) - 1.0, 0.0,
                   jnp.maximum(Hp - window_y, 0.0))
    wx0 = jnp.clip(jnp.floor(x1) - 1.0, 0.0,
                   jnp.maximum(Wl - window_x, 0.0))
    if align_x > 1:
        wx0 = jnp.floor(wx0 / align_x) * align_x

    rel_y_raw = yc - wy0[:, None]
    rel_x_raw = xc - wx0[:, None]
    rel_y = jnp.clip(rel_y_raw, 0.0, window_y - 1.0)
    rel_x = jnp.clip(rel_x_raw, 0.0, window_x - 1.0)
    # Exact-coverage flag: every weighted (in-bounds) sample sits inside
    # [0, window-1], so the clips above are no-ops and the windowed result
    # equals exact RoIAlign for this RoI.
    ok = (jnp.all((~in_y) | ((rel_y_raw >= 0.0)
                             & (rel_y_raw <= window_y - 1.0)), axis=1)
          & jnp.all((~in_x) | ((rel_x_raw >= 0.0)
                               & (rel_x_raw <= window_x - 1.0)), axis=1))

    vy = _axis_weights_window(rel_y, in_y.astype(jnp.float32), window_y)
    vx = _axis_weights_window(rel_x, in_x.astype(jnp.float32), window_x)
    # Fold the G-sample average into the weights: (R, S, WIN) -> (R, P, WIN)
    R = rois.shape[0]
    vy = vy.reshape(R, pooled, sampling_ratio, window_y).mean(axis=2)
    vx = vx.reshape(R, pooled, sampling_ratio, window_x).mean(axis=2)
    vy = vy.astype(weight_dtype)
    vx = vx.astype(weight_dtype)

    start_y = (off_y + wy0).astype(jnp.int32)
    # col_off: per-level column origins for the 2-D packed canvas layout
    # (ladder path); None = all levels at column 0 (row-stacked canvas).
    off_x = 0.0 if col_off is None else col_off[lvl]
    start_x = (off_x + wx0).astype(jnp.int32)
    return start_y, start_x, vy, vx, ok


def _canvas_meta(pyramid, window):
    dims = [(f.shape[-3], f.shape[-2]) for f in pyramid]
    heights = jnp.asarray([d[0] for d in dims], jnp.float32)
    widths = jnp.asarray([d[1] for d in dims], jnp.float32)
    pad_rows_l = [max(d[0], window) for d in dims]
    row_off = jnp.asarray(
        [sum(pad_rows_l[:i]) for i in range(len(dims))], jnp.float32)
    pad_rows = jnp.asarray(pad_rows_l, jnp.float32)
    return heights, widths, row_off, pad_rows


# Default compaction fractions for the ladder's fixup sweeps. Shared by
# multilevel_roi_align_pallas_ladder's signature and the Pallas backward's
# _ladder_geom call so the two cannot silently diverge (the trainable
# entry point does not expose frac overrides).
LADDER_TOP_FRAC = 4
LADDER_FIX_FRAC = 8


def _ladder_geom(dims, C, item, pooled, rungs, J, narrow_base, top_frac,
                 fix_frac):
    """Static ladder geometry, shared by the forward sweep dispatch and
    the Pallas backward (window-accumulate) so the two transpose the SAME
    linear map: base window shape, VMEM-fitted fixup rungs + compaction
    fractions, canvas layout (2-D packed or row-stacked) with per-level
    row/col origins, and the canvas H/W. dims: list of (H_l, W_l); item:
    the FORWARD pyramid dtype's itemsize (rung fitting must match the
    forward even when the backward accumulates in f32)."""
    from detectron_tpu.ops.pallas import roi_align_kernel as rk

    H_top, W_top = dims[-1]
    wy_base = rungs[0][0]
    x_cover = 0 if narrow_base else (W_top if H_top <= wy_base else 0)
    wx_base = -(-max(rungs[0][1], wy_base + 8, x_cover) // 8) * 8

    fix_shapes = list(rungs[1:])
    fracs = [fix_frac] * len(fix_shapes)
    if narrow_base:
        top_rung = (max(wy_base, H_top),
                    -(-max(W_top, wy_base + 8) // 8) * 8)
        fix_shapes = [top_rung] + fix_shapes
        fracs = [top_frac] + fracs

    fix_rungs = tuple(
        (wy, rk.fit_window_x_seg(J, pooled, wy, wx, C, item))
        for wy, wx in fix_shapes)
    wy_max = max([wy_base] + [wy for wy, _ in fix_shapes])
    wx_max = max([wx_base] + [wx for _, wx in fix_shapes])

    hp_last = max(H_top, wy_base)
    overhang = 0 if x_cover else max(0, wy_max - hp_last)
    use_2d = (len(dims) >= 2 and dims[0][1] >= wx_max
              and max(dims[0][0], wy_base) >= wy_max)
    if use_2d:
        row_off_l, col_off_l, pad_rows_l, Hc, Wc = _canvas_2d_geom(
            dims, wy_base, wx_max, overhang)
    else:
        pad_rows_l = [max(d[0], wy_base) for d in dims]
        row_off_l = [sum(pad_rows_l[:i]) for i in range(len(dims))]
        col_off_l = [0] * len(dims)
        Hc = sum(pad_rows_l) + overhang
        Wc = -(-(max(d[1] for d in dims) + wx_max) // 8) * 8
    return dict(wy_base=wy_base, wx_base=wx_base, x_cover=x_cover,
                fix_rungs=fix_rungs, fracs=tuple(fracs), wy_max=wy_max,
                wx_max=wx_max, overhang=overhang, use_2d=use_2d,
                row_off_l=row_off_l, col_off_l=col_off_l,
                pad_rows_l=pad_rows_l, Hc=Hc, Wc=Wc)


def _rung_route(rois_flat, scales, heights, widths, k_min, k_max,
                canonical_scale, canonical_level, fix_rungs):
    """Per-RoI fixup routing (shared forward/backward): first rung whose
    window analytically covers the RoI's level-clamped extent (+2 bilinear
    border, +1 origin floor, +8 x alignment; or whole-level). Returns
    (covered (n,) bool, rid (n,) int32)."""
    lvl = roi_levels(rois_flat.astype(jnp.float32), k_min, k_max,
                     canonical_scale, canonical_level)
    sc = jnp.asarray(scales, jnp.float32)[lvl - k_min]
    Hl = heights[lvl - k_min]
    Wl = widths[lvl - k_min]
    rf = rois_flat.astype(jnp.float32)
    ex = jnp.minimum((rf[:, 2] - rf[:, 0] + 1.0) * sc, Wl)
    ey = jnp.minimum((rf[:, 3] - rf[:, 1] + 1.0) * sc, Hl)

    rid = jnp.zeros((rois_flat.shape[0],), jnp.int32)
    covered = jnp.zeros(rid.shape, bool)
    for r in range(len(fix_rungs) - 1, -1, -1):
        wy_r, wx_r = fix_rungs[r]
        fits = (((ey + 4.0 <= wy_r) | (wy_r >= Hl))
                & ((ex + 12.0 <= wx_r) | (wx_r >= Wl)))
        rid = jnp.where(fits, jnp.int32(r), rid)
        covered = covered | fits
    return covered, rid


def _canvas_2d_geom(pyramid_dims, window_y, wx_pad, overhang_b):
    """2-D packed canvas geometry (ladder path): the (largest) level 0
    alone in column A at origin (0, 0) — its own width is >= every window,
    so it needs NO x padding — and levels 1.. row-stacked in column B at
    col offset roundup8(W_0), padded to the column width so whole-level
    windows read only zeros beyond a level's edge. Shrinks the canvas area
    to ~2/3 of the row-stacked layout at Mask R-CNN shapes (the canvas
    build was 6.9 ms/step at batch 32 — pure HBM writes, scaling with
    area). Returns (row_off list, col_off list, pad_rows list, H, W)."""
    pad_rows = [max(d[0], window_y) for d in pyramid_dims]
    col_b = -(-pyramid_dims[0][1] // 8) * 8
    row_off = [0] + [sum(pad_rows[1:i]) for i in range(1, len(pyramid_dims))]
    col_off = [0] + [col_b] * (len(pyramid_dims) - 1)
    wb = max([wx_pad] + [d[1] for d in pyramid_dims[1:]])
    W = col_b + (-(-wb // 8) * 8)
    H = max(pad_rows[0], sum(pad_rows[1:]) + overhang_b)
    return row_off, col_off, pad_rows, H, W


def build_canvas_batched_2d(pyramid, window_y, wx_pad, overhang_b=0):
    """pyramid: list of (B, H_l, W_l, C) -> 2-D packed canvas (B, H, W, C)
    per _canvas_2d_geom."""
    dims = [(f.shape[1], f.shape[2]) for f in pyramid]
    row_off, col_off, pad_rows, H, W = _canvas_2d_geom(
        dims, window_y, wx_pad, overhang_b)
    col_b = col_off[1]
    f0 = pyramid[0]
    colA = jnp.pad(f0, ((0, 0), (0, H - dims[0][0]),
                        (0, col_b - dims[0][1]), (0, 0)))
    blocks = []
    for i, f in enumerate(pyramid[1:], start=1):
        blocks.append(jnp.pad(
            f, ((0, 0), (0, pad_rows[i] - dims[i][0]),
                (0, (W - col_b) - dims[i][1]), (0, 0))))
    colB = jnp.concatenate(blocks, axis=1)
    hb = colB.shape[1]
    if hb < H:
        colB = jnp.pad(colB, ((0, 0), (0, H - hb), (0, 0), (0, 0)))
    return jnp.concatenate([colA, colB], axis=2)


@functools.partial(
    jax.jit,
    static_argnames=("pooled", "sampling_ratio", "k_min", "k_max", "window",
                     "chunk", "canonical_scale", "canonical_level",
                     "return_ok"),
)
def multilevel_roi_align_windowed(pyramid, scales, rois, pooled,
                                  sampling_ratio, k_min, k_max,
                                  canonical_scale=224, canonical_level=4,
                                  window=40, chunk=256, return_ok=False):
    """pyramid: list of (H_l, W_l, C) for ONE image (k_min..k_max);
    rois: (R, 4) image coords. Returns (R, pooled, pooled, C), or
    ((R, pooled, pooled, C), ok (R,) bool) with return_ok=True (ok: the
    window fully covered the RoI's samples — see window_params)."""
    assert sampling_ratio > 0
    L = len(pyramid)
    assert L == k_max - k_min + 1
    C = pyramid[0].shape[-1]
    dtype = pyramid[0].dtype

    canvas, _, _ = build_canvas(pyramid, window)
    Hc, Wc = canvas.shape[:2]
    heights, widths, row_off, pad_rows = _canvas_meta(pyramid, window)
    R = rois.shape[0]

    start_y, start_x, vy, vx, ok = window_params(
        rois, scales, heights, widths, row_off, pad_rows, Wc, pooled,
        sampling_ratio, k_min, k_max, canonical_scale, canonical_level,
        window, window, dtype)

    n_chunks = max(1, -(-R // chunk))
    pad = n_chunks * chunk - R

    def padz(a):
        return jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1)) if pad else a

    args = jax.tree.map(padz, (start_y, start_x, vy, vx))
    args = jax.tree.map(
        lambda a: a.reshape((n_chunks, chunk) + a.shape[1:]), args)

    def do_chunk(a):
        sy, sx, vyc, vxc = a
        win = jax.vmap(
            lambda y0, x0: jax.lax.dynamic_slice(
                canvas, (y0, x0, jnp.int32(0)), (window, window, C))
        )(sy, sx)  # (chunk, WIN, WIN, C)
        tmp = jnp.einsum("rph,rhwc->rpwc", vyc, win,
                         preferred_element_type=jnp.float32)
        out = jnp.einsum("rqw,rpwc->rpqc", vxc.astype(jnp.float32), tmp,
                         preferred_element_type=jnp.float32)
        return out.astype(dtype)

    out = jax.lax.map(do_chunk, args)
    out = out.reshape((n_chunks * chunk, pooled, pooled, C))
    return (out[:R], ok) if return_ok else out[:R]


def build_canvas_batched(pyramid, window_y, window_x, overhang_y=0):
    """pyramid: list of (B, H_l, W_l, C) -> canvas (B, Hc, Wc, C).
    Wc is padded to a multiple of 8 for TPU sublane tiling. overhang_y:
    extra zero rows appended BELOW the last level so windows taller than
    window_y (ladder rungs) never slice past the canvas end (overhang rows
    are zero-weighted; see window_params)."""
    C = pyramid[0].shape[-1]
    wmax = max(f.shape[2] for f in pyramid) + window_x
    wmax = -(-wmax // 8) * 8
    blocks = []
    for i, f in enumerate(pyramid):
        H, W = f.shape[1], f.shape[2]
        Hp = max(H, window_y)
        extra = overhang_y if i == len(pyramid) - 1 else 0
        blocks.append(jnp.pad(
            f, ((0, 0), (0, Hp - H + extra), (0, wmax - W), (0, 0))))
    return jnp.concatenate(blocks, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("pooled", "sampling_ratio", "k_min", "k_max", "window",
                     "rois_per_step", "canonical_scale", "canonical_level",
                     "interpret", "x_cover", "out_qp"),
)
def multilevel_roi_align_pallas(pyramid, scales, rois, pooled,
                                sampling_ratio, k_min, k_max,
                                canonical_scale=224, canonical_level=4,
                                window=48, rois_per_step=8, interpret=False,
                                x_cover=0, out_qp=False):
    """Batched Pallas path. pyramid: list of (B, H_l, W_l, C); rois:
    (B, R, 4). Returns (B, R, pooled, pooled, C). Same numerics as
    multilevel_roi_align_windowed; the per-RoI window reads are explicit
    async DMAs (ops/pallas/roi_align_kernel.py).

    x_cover: widen the x window to at least this many cells (rounded up
    to the 8-sublane tile). The full-canvas top-level path passes the top
    level's width so every top RoI's window pins to x=0 and spans the
    whole level (see window_params)."""
    from detectron_tpu.ops.pallas import roi_align_kernel as rk

    assert sampling_ratio > 0
    B, R = rois.shape[:2]
    C = pyramid[0].shape[-1]
    window_y = window
    # slack for the 8-aligned x start, or whole-level x coverage
    window_x = -(-max(window + 8, x_cover) // 8) * 8

    canvas = build_canvas_batched(pyramid, window_y, window_x)
    Wc = canvas.shape[2]
    heights, widths, row_off, pad_rows = _canvas_meta(
        [f[0] for f in pyramid], window_y)

    def params_one(r):
        return window_params(
            r, scales, heights, widths, row_off, pad_rows, Wc, pooled,
            sampling_ratio, k_min, k_max, canonical_scale, canonical_level,
            window_y, window_x, canvas.dtype, align_x=8)

    start_y, start_x, vy, vx, _ = jax.vmap(params_one)(rois)
    img_idx = jnp.broadcast_to(
        jnp.arange(B, dtype=jnp.int32)[:, None], (B, R))
    starts = jnp.stack(
        [img_idx, start_y, start_x], axis=-1).reshape(B * R, 3)
    vy = vy.reshape(B * R, pooled, window_y)
    vx = vx.reshape(B * R, pooled, window_x)

    N = B * R
    pad = (-N) % rois_per_step
    if pad:
        starts = jnp.pad(starts, ((0, pad), (0, 0)))
        vy = jnp.pad(vy, ((0, pad), (0, 0), (0, 0)))
        vx = jnp.pad(vx, ((0, pad), (0, 0), (0, 0)))

    out = rk.roi_window_pool(canvas, starts, vy, vx, window_y, window_x,
                             pooled, rois_per_step=rois_per_step,
                             interpret=interpret, out_qp=out_qp)
    return out[:N].reshape(B, R, pooled, pooled, C)


# ---------------------------------------------------------------------------
# Window-shape rung LADDER: one base full-canvas sweep (the single-window
# kernel, unchanged cost) + small COMPACTED fixup sweeps at taller/wider
# window shapes for the rare elongated mid-level RoIs the base clamps
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("pooled", "sampling_ratio", "k_min", "k_max", "rungs",
                     "rois_per_step", "canonical_scale", "canonical_level",
                     "interpret", "out_qp", "fix_frac", "narrow_base",
                     "top_frac"),
)
def multilevel_roi_align_pallas_ladder(
        pyramid, scales, rois, pooled, sampling_ratio, k_min, k_max,
        canonical_scale=224, canonical_level=4,
        rungs=((32, 40), (64, 48), (32, 96)), rois_per_step=8,
        interpret=False, out_qp=False, fix_frac=LADDER_FIX_FRAC,
        narrow_base=False, top_frac=LADDER_TOP_FRAC):
    """Batched Pallas RoIAlign with a per-RoI-shape WINDOW LADDER.

    The BASE sweep is exactly the single-window full-canvas kernel (rung 0
    height, x widened to cover the whole top level): exact for moderate
    RoIs (the ~95+% common case) and for top-level RoIs of any extent, at
    the same cost as the round-2 production path. RoIs the base window
    cannot cover (elongated mid-level RoIs — the reference CUDA kernel
    lib/modeling/roi_xfrom/roi_align is exact for these; the base clamps
    them) are COMPACTED per fixup rung (jnp.nonzero in chunks of a static
    ~n/fix_frac capacity inside a count-bounded lax.while_loop), pooled
    by a bounded-count segmented sweep (roi_window_pool_seg) at that
    rung's taller/wider window, and scattered back in place (the while
    carry aliases — no full-output copies, see the fixup section
    comment). Net cost of exactness: small sweeps whose machinery AND
    DMA are proportional to the ACTUAL elongated count — a few percent
    in real detection workloads; zero-count rungs cost one predicate.

    EXACT for every RoI: rung-covered RoIs pool in the kernel; the rare
    RoIs beyond every rung's coverage (aspect ~>=10 at band-top sizes,
    including shapes uncovered because the scoped-VMEM fitter shrank a
    rung at f32/pooled=14) route through the same chunked exact-gather
    fixup (ops/multilevel_roi.py :: multilevel_roi_align_canvas_flat) —
    matching the reference CUDA kernel (lib/modeling/roi_xfrom/
    roi_align), which is exact for all shapes at any count.

    narrow_base: do NOT widen the base window to whole-top-level x
    coverage — the base stays at rungs[0] (e.g. (32, 40) vs the widened
    (32, 48) at the 832x1344 canvas, a ~17% cut of the dominant base-sweep
    DMA) and top-level RoIs the base cannot cover route through an
    auto-appended whole-top-level fixup rung with its own generous
    compaction capacity n/top_frac (top-level RoIs are common, unlike
    elongated ones). Same exactness everywhere — only the DMA/capacity
    routing changes.

    Returns (B, R, pooled, pooled, C) — (q, p)-transposed per RoI with
    out_qp=True (absorbed by the box-head FC weight permutation)."""
    from detectron_tpu.ops.pallas import roi_align_kernel as rk

    assert sampling_ratio > 0
    B, R = rois.shape[:2]
    C = pyramid[0].shape[-1]
    J = rois_per_step
    n = B * R
    item = pyramid[0].dtype.itemsize

    # Static geometry (base window, VMEM-fitted fixup rungs, canvas
    # layout) comes from _ladder_geom — shared with the Pallas backward
    # so forward and transpose cannot drift. See _ladder_geom and the
    # round-3/4 PERF.md notes for why each piece is shaped the way it is
    # (elevated fixup VMEM scope, unshrunk canvas x-pad for box/mask
    # canvas CSE, 2-D packing validity, bottom overhang for tall rungs).
    dims = [(f.shape[1], f.shape[2]) for f in pyramid]
    g = _ladder_geom(dims, C, item, pooled, rungs, J, narrow_base,
                     top_frac, fix_frac)
    wy_base, wx_base = g["wy_base"], g["wx_base"]
    x_cover = g["x_cover"]
    fix_rungs, fracs = g["fix_rungs"], g["fracs"]
    row_off_l, col_off_l = g["row_off_l"], g["col_off_l"]
    heights = jnp.asarray([d[0] for d in dims], jnp.float32)
    widths = jnp.asarray([d[1] for d in dims], jnp.float32)
    if g["use_2d"]:
        canvas = build_canvas_batched_2d(pyramid, wy_base, g["wx_max"],
                                         g["overhang"])
        col_off = jnp.asarray(col_off_l, jnp.float32)
    else:
        canvas = build_canvas_batched(pyramid, wy_base, g["wx_max"],
                                      overhang_y=g["overhang"])
        col_off = None
    row_off = jnp.asarray(row_off_l, jnp.float32)
    pad_rows = jnp.asarray(g["pad_rows_l"], jnp.float32)
    assert canvas.shape[1] == g["Hc"] and canvas.shape[2] == g["Wc"], (
        canvas.shape, g)
    Wc = canvas.shape[2]

    def params_flat(r2, wy, wx):
        return window_params(
            r2, scales, heights, widths, row_off, pad_rows, Wc, pooled,
            sampling_ratio, k_min, k_max, canonical_scale, canonical_level,
            wy, wx, canvas.dtype, align_x=8, col_off=col_off)

    # ---------------- base sweep ----------------
    rois_flat = rois.reshape(n, 4)
    sy, sx, vy, vx, ok = params_flat(rois_flat, wy_base, wx_base)
    img_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), R)
    starts = jnp.stack([img_idx, sy, sx], axis=-1)
    pad = (-n) % J
    if pad:
        starts = jnp.pad(starts, ((0, pad), (0, 0)))
        vy = jnp.pad(vy, ((0, pad), (0, 0), (0, 0)))
        vx = jnp.pad(vx, ((0, pad), (0, 0), (0, 0)))
    out = rk.roi_window_pool(canvas, starts, vy, vx, wy_base, wx_base,
                             pooled, rois_per_step=J, interpret=interpret,
                             out_qp=out_qp)[:n]

    if not fix_rungs:
        return out.reshape(B, R, pooled, pooled, C)

    # ---------------- fixup sweeps: count-scaled while-loop chunking ----
    # Round 3 used nested lax.cond capacity TIERS (n/64 -> n/8 -> n/4 ->
    # full) around each rung sweep plus an outer any(need) cond. Round-4
    # xprof (batch 48) showed the conds themselves were the overhead: the
    # (B*R, P, P, C) output is 1.2 GB at production shapes, and threading
    # it through conditionals cost a full-buffer copy (copy.1412,
    # 3.9 ms/step) plus a non-aliased whole-buffer scatter rewrite
    # (fusion.885, 6.6 ms/step) — while the seg sweeps' DMA was already
    # exactly count-proportional. The tier ladder is replaced by ONE
    # static chunk capacity (~n/fix_frac) per rung and a lax.while_loop
    # over ceil(count/cap) chunks: while-loop carries alias in place (no
    # big-buffer copy, scatters update only touched rows), a zero-count
    # rung costs one predicate (trip count 0), and ANY count is exact by
    # looping — no escalation branches, no full-capacity escape hatch.
    cap_full = -(-n // J) * J
    need = ~ok

    # Per-RoI fixup routing (level-clamped extents; RoIs beyond every
    # rung go ONLY to the exact gather fixup — pooling them clamped in a
    # rung first was wasted DMA, the gather overwrote it). Shared with
    # the backward via _rung_route.
    covered, rid = _rung_route(rois_flat, scales, heights, widths, k_min,
                               k_max, canonical_scale, canonical_level,
                               fix_rungs)

    def chunk_loop(out_flat, sel, cap, chunk_fn):
        """Scatter chunk_fn(idx)'s rows into out_flat for every selected
        row, cap rows per chunk, ceil(count/cap) while-loop iterations."""
        count = jnp.sum(sel.astype(jnp.int32))
        rank = jnp.cumsum(sel.astype(jnp.int32)) - 1
        nchunks = (count + cap - 1) // cap

        def body(carry):
            k, of = carry
            lo = k * cap
            sel_k = sel & (rank >= lo) & (rank < lo + cap)
            idx = jnp.nonzero(sel_k, size=cap,
                              fill_value=n)[0].astype(jnp.int32)
            cnt_k = jnp.minimum(count - lo, cap)
            vals = chunk_fn(idx, cnt_k)
            # Pad slots carry idx == n -> dropped by the scatter.
            return k + 1, of.at[idx].set(vals.astype(of.dtype),
                                         mode="drop")

        return jax.lax.while_loop(
            lambda c: c[0] < nchunks, body, (jnp.int32(0), out_flat))[1]

    out_flat = out

    for r, (wy_r, wx_r) in enumerate(fix_rungs):
        cap = min(-(-max(n // fracs[r], J) // J) * J, cap_full)

        def rung_chunk(idx, cnt_k, wy_r=wy_r, wx_r=wx_r, cap=cap):
            safe = jnp.minimum(idx, n - 1)
            fsy, fsx, fvy, fvx, _ = params_flat(
                rois_flat[safe], wy_r, wx_r)
            fstarts = jnp.stack([img_idx[safe], fsy, fsx], axis=-1)
            seg = jnp.stack([jnp.int32(0), (cnt_k + J - 1) // J])
            return rk.roi_window_pool_seg(
                canvas, seg, fstarts, fvy, fvx, wy_r, wx_r, pooled,
                rois_per_step=J, interpret=interpret, out_qp=out_qp)[:cap]

        out_flat = chunk_loop(out_flat, need & covered & (rid == r), cap,
                              rung_chunk)

    # Beyond-ladder slivers (no rung — even VMEM-shrunk — covers the
    # RoI, aspect ~>= 10 at band-top sizes): EXACT gather fixup, the
    # same formulation the trainable backward transposes
    # (ops/multilevel_roi.py). Samples gather IN PLACE from the packed
    # canvas already in HBM (no flat-pyramid rebuild), chunked by the
    # same while loop — a batch without such RoIs (all practical
    # detection workloads) pays one predicate.
    from detectron_tpu.ops import multilevel_roi as ml

    # Sliver chunk capacity is much smaller than the rungs' (n/256 vs
    # n/fix_frac): the gather formulation costs ~linearly in CAP, not in
    # count (its internal lax.map runs cap/128 sequential chunks even for
    # a single sliver), and real workloads have at most a handful per
    # step. Measured round 4 (batch 48, calibrated): cap n/8 cost 31
    # ms/step for a near-zero sliver count; cap n/256 -> <1 ms. Large
    # sliver counts just loop more — exactness is count-independent.
    cap_sl = min(-(-max(n // 256, J) // J) * J, cap_full)

    def sliver_chunk(idx, cnt_k):
        safe = jnp.minimum(idx, n - 1)
        vals = ml.multilevel_roi_align_canvas_flat(
            canvas, tuple(dims), tuple(row_off_l),
            tuple(col_off_l), scales, rois_flat[safe],
            img_idx[safe], pooled, sampling_ratio, k_min, k_max,
            canonical_scale=canonical_scale,
            canonical_level=canonical_level, chunk=min(cap_sl, 128))
        if out_qp:
            vals = jnp.swapaxes(vals, 1, 2)
        return vals

    out_flat = chunk_loop(out_flat, need & ~covered, cap_sl, sliver_chunk)
    return out_flat.reshape(B, R, pooled, pooled, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 3, 4, 5, 6, 7, 8, 9,
                                                    10, 11, 12, 13))
def multilevel_roi_align_ladder_trainable(
        pyramid, scales, rois, pooled, sampling_ratio, k_min, k_max,
        canonical_scale, canonical_level, rungs, rois_per_step, interpret,
        out_qp=False, narrow_base=False):
    """Differentiable (w.r.t. pyramid) ladder RoIAlign. Forward is the
    rung-segmented Pallas kernel plus the exact-gather sliver fixup (exact
    RoIAlign for EVERY RoI); backward is the linear transpose of the same
    exact gather formulation (ops/multilevel_roi.py) — the identical
    linear map. RoIs get zero cotangent (proposals are detached, as in
    the reference where proposals are host numpy)."""
    return multilevel_roi_align_pallas_ladder(
        pyramid, scales, rois, pooled, sampling_ratio, k_min, k_max,
        canonical_scale=canonical_scale, canonical_level=canonical_level,
        rungs=rungs, rois_per_step=rois_per_step, interpret=interpret,
        out_qp=out_qp, narrow_base=narrow_base)


def _ladder_trainable_fwd(pyramid, scales, rois, pooled, sampling_ratio,
                          k_min, k_max, canonical_scale, canonical_level,
                          rungs, rois_per_step, interpret, out_qp=False,
                          narrow_base=False):
    out = multilevel_roi_align_pallas_ladder(
        pyramid, scales, rois, pooled, sampling_ratio, k_min, k_max,
        canonical_scale=canonical_scale, canonical_level=canonical_level,
        rungs=rungs, rois_per_step=rois_per_step, interpret=interpret,
        out_qp=out_qp, narrow_base=narrow_base)
    pyr_struct = jax.tree.map(
        lambda f: jax.ShapeDtypeStruct(f.shape, f.dtype), list(pyramid))
    return out, (rois, pyr_struct)


def _ladder_bwd_gather(scales, pooled, sampling_ratio, k_min, k_max,
                       canonical_scale, canonical_level, res, ct):
    """Round-3 backward: transpose of the exact gather formulation, which
    XLA lowers to per-sample scatter-adds (0.7-27 GB/s — 44% of the train
    step at batch 8, round-4 xprof). Kept as the parity oracle for the
    Pallas window-accumulate backward and as an A/B escape hatch
    (DETECTRON_TPU_ROI_BWD=gather)."""
    from detectron_tpu.ops import multilevel_roi as ml

    rois, pyr_struct = res

    def fwd_lin(pyr):
        def one(fs, r):
            return ml.multilevel_roi_align(
                fs, scales, r, pooled, sampling_ratio, k_min, k_max,
                canonical_scale=canonical_scale,
                canonical_level=canonical_level, chunk=128)

        return jax.vmap(one)(pyr, rois)

    # fwd_lin is linear in the pyramid, so its pullback is point-independent:
    # evaluate the vjp at zeros (linear_transpose can't see through the
    # gather path's lax.map whose linear operand is closure-captured).
    zeros = [jnp.zeros(s.shape, s.dtype) for s in pyr_struct]
    _, vjp_fn = jax.vjp(fwd_lin, zeros)
    d_pyr = vjp_fn(ct.astype(pyr_struct[0].dtype))[0]
    return (d_pyr, jnp.zeros_like(rois))


def _ladder_trainable_bwd(scales, pooled, sampling_ratio, k_min, k_max,
                          canonical_scale, canonical_level, rungs,
                          rois_per_step, interpret, out_qp, narrow_base,
                          res, ct):
    """Backward of the ladder RoIAlign: the Pallas window-accumulate
    kernel (ops/pallas/roi_align_kernel.py :: roi_window_accum_seg) RMWs
    each RoI's window gradient into an f32 canvas at DMA rate, routed by
    the SAME per-RoI geometry as the forward (base window for covered
    RoIs, fixup rungs via count-scaled while-loop chunks, exact gather
    transpose for beyond-ladder slivers) — the transpose of the identical
    linear map. Replaces the XLA gather-transpose scatter-adds (158.7
    ms/step at train batch 8, 44% of the step — round-4 xprof); see
    _ladder_bwd_gather for the retained oracle."""
    import os

    if out_qp:
        ct = jnp.swapaxes(ct, 2, 3)
    if os.environ.get("DETECTRON_TPU_ROI_BWD") == "gather":
        return _ladder_bwd_gather(scales, pooled, sampling_ratio, k_min,
                                  k_max, canonical_scale, canonical_level,
                                  res, ct)

    from detectron_tpu.ops import multilevel_roi as ml
    from detectron_tpu.ops.pallas import roi_align_kernel as rk

    rois, pyr_struct = res
    B, R = rois.shape[:2]
    n = B * R
    J = rois_per_step
    C = pyr_struct[0].shape[-1]
    dtype = pyr_struct[0].dtype
    dims = [(s.shape[1], s.shape[2]) for s in pyr_struct]
    # Rung fitting uses the FORWARD dtype's itemsize: the backward must
    # transpose the same per-RoI window routing the forward used.
    g = _ladder_geom(dims, C, jnp.dtype(dtype).itemsize, pooled,
                     tuple(rungs), J, narrow_base, LADDER_TOP_FRAC,
                     LADDER_FIX_FRAC)
    heights = jnp.asarray([d[0] for d in dims], jnp.float32)
    widths = jnp.asarray([d[1] for d in dims], jnp.float32)
    row_off = jnp.asarray(g["row_off_l"], jnp.float32)
    col_off = (jnp.asarray(g["col_off_l"], jnp.float32)
               if g["use_2d"] else None)
    pad_rows = jnp.asarray(g["pad_rows_l"], jnp.float32)

    rois_flat = rois.reshape(n, 4)
    img_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), R)
    # f32 weights: gradient accumulation precision (the forward's bf16
    # weight rounding is a forward-value detail; both the gather oracle
    # and this path transpose with full-precision weights).
    ct_flat = ct.reshape(n, pooled, pooled, C).astype(jnp.float32)

    def params_flat(r2, wy, wx):
        return window_params(
            r2, scales, heights, widths, row_off, pad_rows, g["Wc"],
            pooled, sampling_ratio, k_min, k_max, canonical_scale,
            canonical_level, wy, wx, jnp.float32, align_x=8,
            col_off=col_off)

    sy, sx, vy, vx, ok = params_flat(rois_flat, g["wy_base"], g["wx_base"])
    covered, rid = _rung_route(rois_flat, scales, heights, widths, k_min,
                               k_max, canonical_scale, canonical_level,
                               g["fix_rungs"])
    need = ~ok

    # ------- base accumulate: all base-covered RoIs, masked (not
    # compacted — they are ~all of the RoIs) -------
    # With no fixup rungs the FORWARD early-returns the clamped
    # base-window result for every RoI (covered or not), so the transpose
    # must route ALL cotangents through the base window — masking by `ok`
    # and gather-transposing the rest would transpose a different map.
    starts = jnp.stack([img_idx, sy, sx], axis=-1)
    if g["fix_rungs"]:
        d_base = jnp.where(ok[:, None, None, None], ct_flat, 0.0)
    else:
        d_base = ct_flat
    pad = (-n) % J
    if pad:
        # Pad slots: zero cotangent at origin (0, 0, 0) — accumulates +0.
        starts = jnp.pad(starts, ((0, pad), (0, 0)))
        d_base = jnp.pad(d_base, ((0, pad),) + ((0, 0),) * 3)
        vy = jnp.pad(vy, ((0, pad), (0, 0), (0, 0)))
        vx = jnp.pad(vx, ((0, pad), (0, 0), (0, 0)))
    canvas = jnp.zeros((B, g["Hc"], g["Wc"], C), jnp.float32)
    canvas = rk.roi_window_accum_seg(
        canvas, jnp.asarray([0, (n + pad) // J], jnp.int32), starts,
        d_base, vy, vx, g["wy_base"], g["wx_base"], pooled,
        rois_per_step=J, interpret=interpret)

    cap_full = -(-n // J) * J

    def chunk_accum(cv, sel, cap, accum_fn):
        """While-loop twin of the forward's chunk_loop: accumulate
        accum_fn's contribution for every selected RoI, cap rows per
        chunk; a zero-count selection costs one predicate."""
        count = jnp.sum(sel.astype(jnp.int32))
        rank = jnp.cumsum(sel.astype(jnp.int32)) - 1
        nchunks = (count + cap - 1) // cap

        def body(carry):
            k, c = carry
            lo = k * cap
            sel_k = sel & (rank >= lo) & (rank < lo + cap)
            idx = jnp.nonzero(sel_k, size=cap,
                              fill_value=n)[0].astype(jnp.int32)
            cnt_k = jnp.minimum(count - lo, cap)
            return k + 1, accum_fn(c, idx, cnt_k)

        return jax.lax.while_loop(
            lambda c: c[0] < nchunks, body, (jnp.int32(0), cv))[1]

    for r, (wy_r, wx_r) in enumerate(g["fix_rungs"]):
        cap = min(-(-max(n // g["fracs"][r], J) // J) * J, cap_full)

        def rung_accum(cv, idx, cnt_k, wy_r=wy_r, wx_r=wx_r, cap=cap):
            safe = jnp.minimum(idx, n - 1)
            fsy, fsx, fvy, fvx, _ = params_flat(rois_flat[safe], wy_r, wx_r)
            fstarts = jnp.stack([img_idx[safe], fsy, fsx], axis=-1)
            live = (idx < n)[:, None, None, None]
            fct = jnp.where(live, ct_flat[safe], 0.0)
            seg = jnp.stack([jnp.int32(0), (cnt_k + J - 1) // J])
            return rk.roi_window_accum_seg(
                cv, seg, fstarts, fct, fvy, fvx, wy_r, wx_r, pooled,
                rois_per_step=J, interpret=interpret)

        canvas = chunk_accum(canvas, need & covered & (rid == r), cap,
                             rung_accum)

    # ------- beyond-ladder slivers: exact gather transpose, added into
    # the same canvas (linear in the canvas, vjp at zeros); a batch with
    # no slivers pays one predicate (while-loop trip count 0). Skipped
    # entirely when the ladder has no fixup rungs — the forward routed
    # everything through the base window (see d_base above). -------
    cap_sl = min(-(-max(n // 256, J) // J) * J, cap_full)

    def sliver_accum(cv, idx, cnt_k):
        safe = jnp.minimum(idx, n - 1)
        live = (idx < n)[:, None, None, None]
        fct = jnp.where(live, ct_flat[safe], 0.0)

        def f(cz):
            return ml.multilevel_roi_align_canvas_flat(
                cz, tuple(dims), tuple(g["row_off_l"]),
                tuple(g["col_off_l"]), scales, rois_flat[safe],
                img_idx[safe], pooled, sampling_ratio, k_min, k_max,
                canonical_scale=canonical_scale,
                canonical_level=canonical_level, chunk=min(cap_sl, 128))

        _, vjp_fn = jax.vjp(f, jnp.zeros_like(cv))
        return cv + vjp_fn(fct.astype(jnp.float32))[0]

    if g["fix_rungs"]:
        canvas = chunk_accum(canvas, need & ~covered, cap_sl, sliver_accum)

    # Slice the per-level gradient blocks back out of the canvas (the
    # transpose of build_canvas_batched(_2d)'s pad+concat).
    d_pyr = []
    for i, (H, W) in enumerate(dims):
        r0, c0 = g["row_off_l"][i], g["col_off_l"][i]
        d_pyr.append(jax.lax.slice(
            canvas, (0, r0, c0, 0), (B, r0 + H, c0 + W, C)).astype(dtype))
    return (d_pyr, jnp.zeros_like(rois))


multilevel_roi_align_ladder_trainable.defvjp(
    _ladder_trainable_fwd, _ladder_trainable_bwd)


# ---------------------------------------------------------------------------
# Trainable Pallas path: Pallas forward + exact linear-transpose backward
# ---------------------------------------------------------------------------

def _pallas_window_params_batched(pyramid_shapes, scales, rois, pooled,
                                  sampling_ratio, k_min, k_max,
                                  canonical_scale, canonical_level, window,
                                  dtype, Wc, x_cover=0):
    """Shared param computation for the trainable path. pyramid_shapes:
    list of (H_l, W_l)."""
    window_y = window
    window_x = -(-max(window + 8, x_cover) // 8) * 8
    heights = jnp.asarray([d[0] for d in pyramid_shapes], jnp.float32)
    widths = jnp.asarray([d[1] for d in pyramid_shapes], jnp.float32)
    pad_rows_l = [max(d[0], window_y) for d in pyramid_shapes]
    row_off = jnp.asarray(
        [sum(pad_rows_l[:i]) for i in range(len(pyramid_shapes))],
        jnp.float32)
    pad_rows = jnp.asarray(pad_rows_l, jnp.float32)

    def params_one(r):
        return window_params(
            r, scales, heights, widths, row_off, pad_rows, Wc, pooled,
            sampling_ratio, k_min, k_max, canonical_scale, canonical_level,
            window_y, window_x, dtype, align_x=8)

    B, R = rois.shape[:2]
    start_y, start_x, vy, vx, _ = jax.vmap(params_one)(rois)
    img_idx = jnp.broadcast_to(
        jnp.arange(B, dtype=jnp.int32)[:, None], (B, R))
    starts = jnp.stack(
        [img_idx, start_y, start_x], axis=-1).reshape(B * R, 3)
    return (starts, vy.reshape(B * R, pooled, window_y),
            vx.reshape(B * R, pooled, window_x))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 3, 4, 5, 6, 7, 8, 9,
                                                    10, 11, 12, 13))
def multilevel_roi_align_pallas_trainable(
        pyramid, scales, rois, pooled, sampling_ratio, k_min, k_max,
        canonical_scale, canonical_level, window, rois_per_step, interpret,
        x_cover=0, out_qp=False):
    """Differentiable (w.r.t. pyramid) Pallas RoIAlign: forward is the async-
    DMA kernel; backward is the exact linear transpose of the window gather +
    interpolation matmuls (XLA lowers the gather transpose to a fused
    scatter-add). RoIs get zero cotangent (proposals are detached, as in the
    reference where proposals are host numpy)."""
    return multilevel_roi_align_pallas(
        pyramid, scales, rois, pooled, sampling_ratio, k_min, k_max,
        canonical_scale=canonical_scale, canonical_level=canonical_level,
        window=window, rois_per_step=rois_per_step, interpret=interpret,
        x_cover=x_cover, out_qp=out_qp)


def _pallas_trainable_fwd(pyramid, scales, rois, pooled, sampling_ratio,
                          k_min, k_max, canonical_scale, canonical_level,
                          window, rois_per_step, interpret, x_cover=0,
                          out_qp=False):
    out = multilevel_roi_align_pallas(
        pyramid, scales, rois, pooled, sampling_ratio, k_min, k_max,
        canonical_scale=canonical_scale, canonical_level=canonical_level,
        window=window, rois_per_step=rois_per_step, interpret=interpret,
        x_cover=x_cover, out_qp=out_qp)
    shapes = tuple((f.shape[1], f.shape[2]) for f in pyramid)
    pyr_struct = jax.tree.map(
        lambda f: jax.ShapeDtypeStruct(f.shape, f.dtype), list(pyramid))
    return out, (rois, shapes, pyr_struct)


def _pallas_trainable_bwd(scales, pooled, sampling_ratio, k_min, k_max,
                          canonical_scale, canonical_level, window,
                          rois_per_step, interpret, x_cover, out_qp, res,
                          ct):
    """Backward of the single-window Pallas path: the same window-
    accumulate kernel as the ladder backward (every RoI uses the base
    window geometry — the exact transpose of the forward's map, clamping
    included). DETECTRON_TPU_ROI_BWD=gather selects the old XLA
    dynamic_slice linear transpose (scatter-add lowering)."""
    import os

    rois, shapes, pyr_struct = res
    if out_qp:
        # The forward emitted (B, R, Q, P, C); restore (p, q) for the
        # transpose math below (tiny at training RoI counts).
        ct = jnp.swapaxes(ct, 2, 3)
    B, R = rois.shape[:2]
    window_y = window
    window_x = -(-max(window + 8, x_cover) // 8) * 8
    # Canvas width must match build_canvas_batched.
    wmax = max(w for _, w in shapes) + window_x
    Wc = -(-wmax // 8) * 8
    dtype = pyr_struct[0].dtype

    if os.environ.get("DETECTRON_TPU_ROI_BWD") == "gather":
        starts, vy, vx = _pallas_window_params_batched(
            shapes, scales, rois, pooled, sampling_ratio, k_min, k_max,
            canonical_scale, canonical_level, window, dtype, Wc,
            x_cover=x_cover)

        # d_win[n, h, w, c] = sum_{p,q} vy[n,p,h] vx[n,q,w] ct[n,p,q,c]
        ct_f = ct.reshape(B * R, pooled, pooled, -1).astype(jnp.float32)
        tmp = jnp.einsum("nph,npqc->nhqc", vy.astype(jnp.float32), ct_f)
        d_win = jnp.einsum("nqw,nhqc->nhwc", vx.astype(jnp.float32), tmp)

        def gather_windows(pyr):
            canvas = build_canvas_batched(pyr, window_y, window_x)
            C = canvas.shape[-1]

            def one(s):
                return jax.lax.dynamic_slice(
                    canvas, (s[0], s[1], s[2], jnp.int32(0)),
                    (1, window_y, window_x, C))[0]

            return jax.vmap(one)(starts)

        d_pyr = jax.linear_transpose(gather_windows, list(pyr_struct))(
            d_win.astype(dtype))[0]
        return (d_pyr, jnp.zeros_like(rois))

    from detectron_tpu.ops.pallas import roi_align_kernel as rk

    C = pyr_struct[0].shape[-1]
    n = B * R
    J = rois_per_step
    starts, vy, vx = _pallas_window_params_batched(
        shapes, scales, rois, pooled, sampling_ratio, k_min, k_max,
        canonical_scale, canonical_level, window, jnp.float32, Wc,
        x_cover=x_cover)
    ct_flat = ct.reshape(n, pooled, pooled, C).astype(jnp.float32)
    pad = (-n) % J
    if pad:
        starts = jnp.pad(starts, ((0, pad), (0, 0)))
        ct_flat = jnp.pad(ct_flat, ((0, pad),) + ((0, 0),) * 3)
        vy = jnp.pad(vy, ((0, pad), (0, 0), (0, 0)))
        vx = jnp.pad(vx, ((0, pad), (0, 0), (0, 0)))
    pad_rows_l = [max(h, window_y) for h, _ in shapes]
    Hc = sum(pad_rows_l)
    canvas = jnp.zeros((B, Hc, Wc, C), jnp.float32)
    canvas = rk.roi_window_accum_seg(
        canvas, jnp.asarray([0, (n + pad) // J], jnp.int32), starts,
        ct_flat, vy, vx, window_y, window_x, pooled, rois_per_step=J,
        interpret=interpret)
    d_pyr = []
    r0 = 0
    for i, (H, W) in enumerate(shapes):
        d_pyr.append(jax.lax.slice(
            canvas, (0, r0, 0, 0), (B, r0 + H, W, C)).astype(dtype))
        r0 += pad_rows_l[i]
    return (d_pyr, jnp.zeros_like(rois))


multilevel_roi_align_pallas_trainable.defvjp(
    _pallas_trainable_fwd, _pallas_trainable_bwd)


# ---------------------------------------------------------------------------
# Hybrid: windowed slicing below the top level + dense exact top level.
#
# FPN level assignment bounds the feature extent of every UNCLAMPED RoI to
# [s0/2^l0, 2*s0/2^l0) cells (= [14, 28) at the defaults), so a 32-cell
# window is exact for levels k_min..k_max-1. RoIs clamped UP to k_max (huge
# boxes / whole-image proposals) have unbounded extent — the windowed path
# used to clamp their samples to the window edge (bounded approximation).
# Here they are computed exactly by dense whole-level interpolation matmuls
# on the top map (tiny: ~26x42 at 832x1344), and selected per RoI. This is
# both the correctness fix (no clamping anywhere) and a DMA cut (32^2 vs
# 40x48 windows; no top-level rows in the canvas).
# ---------------------------------------------------------------------------

def roi_levels(rois, k_min, k_max, canonical_scale, canonical_level):
    """FPN eq. (1) level assignment (same math as window_params)."""
    w = rois[..., 2] - rois[..., 0] + 1.0
    h = rois[..., 3] - rois[..., 1] + 1.0
    s = jnp.sqrt(jnp.maximum(w * h, 1e-12))
    lvl = jnp.floor(
        canonical_level + jnp.log2(s / canonical_scale + 1e-6))
    return jnp.clip(lvl, k_min, k_max).astype(jnp.int32)


_warned_small_window = set()


def _warn_if_window_small(window, canonical_scale, canonical_level,
                          sampling_ratio):
    """Sub-top-level exactness needs window >= min_exact_window (32 at the
    default canonical scale/level). Smaller windows (tiny test configs)
    clamp samples at the window edge for mid-range RoIs."""
    need = min_exact_window(canonical_scale, canonical_level, sampling_ratio)
    if window < need and window not in _warned_small_window:
        import logging
        logging.getLogger(__name__).warning(
            "ROI window %d < %d: sub-top-level RoIAlign may clamp samples "
            "for mid-range RoIs (exact at window >= %d)", window, need, need)
        _warned_small_window.add(window)


def min_exact_window(canonical_scale, canonical_level, sampling_ratio):
    """Smallest window (cells) exact for all unclamped levels: max extent
    2*s0/2^l0, +2 bilinear border, +1 window-origin floor, rounded up."""
    import math
    return int(math.ceil(2.0 * canonical_scale / (2 ** canonical_level))) + 4


def multilevel_roi_align_hybrid(pyramid, scales, rois, pooled,
                                sampling_ratio, k_min, k_max,
                                canonical_scale=224, canonical_level=4,
                                window=32, chunk=256):
    """ONE image. Exact Detectron RoIAlign for EVERY RoI: windowed slicing
    below the top level + dense whole-level top + a gather-path fixup for
    the rare RoIs whose samples the window cannot cover (elongated
    mid-level RoIs). The fixup branch (ops/multilevel_roi.py — exact for
    any RoI shape) runs under lax.cond, so batches with no such RoI (the
    overwhelmingly common case) pay nothing for it."""
    from detectron_tpu.ops import multilevel_roi as ml
    from detectron_tpu.ops import roi_align as ra

    if len(pyramid) == 1:
        return ra.roi_align(pyramid[0], rois, scales[0], pooled, pooled,
                            sampling_ratio)
    _warn_if_window_small(window, canonical_scale, canonical_level,
                          sampling_ratio)
    out_win, win_ok = multilevel_roi_align_windowed(
        pyramid[:-1], scales[:-1], rois, pooled, sampling_ratio,
        k_min, k_max - 1, canonical_scale=canonical_scale,
        canonical_level=canonical_level, window=window, chunk=chunk,
        return_ok=True)
    out_top = ra.roi_align(pyramid[-1], rois, scales[-1], pooled, pooled,
                           sampling_ratio)
    lvl = roi_levels(rois.astype(jnp.float32), k_min, k_max,
                     canonical_scale, canonical_level)
    is_top = lvl == k_max
    out = jnp.where(is_top[:, None, None, None], out_top, out_win)

    need_fix = (~win_ok) & (~is_top)

    def fixup():
        return ml.multilevel_roi_align(
            pyramid, scales, rois, pooled, sampling_ratio, k_min, k_max,
            canonical_scale=canonical_scale, canonical_level=canonical_level,
            chunk=chunk).astype(out.dtype)

    out_fix = jax.lax.cond(jnp.any(need_fix), fixup,
                           lambda: jnp.zeros_like(out))
    return jnp.where(need_fix[:, None, None, None], out_fix, out)


def multilevel_roi_align_pallas_hybrid(pyramid, scales, rois, pooled,
                                       sampling_ratio, k_min, k_max,
                                       canonical_scale=224,
                                       canonical_level=4, window=32,
                                       rois_per_step=8, interpret=False,
                                       trainable=False, out_qp=False):
    """Batched. Pallas DMA kernel for levels below the top + dense exact top
    level + per-RoI select. With trainable=True the kernel part uses the
    custom_vjp (linear-transpose backward); the dense part is plain
    differentiable XLA either way."""
    from detectron_tpu.ops import roi_align as ra

    if len(pyramid) == 1:
        return jax.vmap(
            lambda f, r: ra.roi_align(f, r, scales[0], pooled, pooled,
                                      sampling_ratio)
        )(pyramid[0], rois)
    _warn_if_window_small(window, canonical_scale, canonical_level,
                          sampling_ratio)

    H_top, W_top = pyramid[-1].shape[1], pyramid[-1].shape[2]
    if H_top <= window:
        # FULL-CANVAS path: the top level fits the window height (it does
        # at every production test shape — e.g. 26x42 at the 832x1344
        # canvas), so top RoIs take whole-level windows (window_params
        # pins their x start to the level origin; x_cover widens the
        # window to the level width). Exact for ANY top-RoI extent — same
        # math as the dense pass — with no separate dense compute and no
        # (B, R, P, P, C)-sized select (xprof: 7.5 + 9.4 ms/step at
        # batch 32).
        if trainable:
            return multilevel_roi_align_pallas_trainable(
                list(pyramid), tuple(scales), rois, pooled,
                sampling_ratio, k_min, k_max, canonical_scale,
                canonical_level, window, rois_per_step, interpret, W_top,
                out_qp)
        return multilevel_roi_align_pallas(
            pyramid, tuple(scales), rois, pooled, sampling_ratio,
            k_min, k_max, canonical_scale=canonical_scale,
            canonical_level=canonical_level, window=window,
            rois_per_step=rois_per_step, interpret=interpret,
            x_cover=W_top, out_qp=out_qp)

    if trainable:
        out_win = multilevel_roi_align_pallas_trainable(
            list(pyramid[:-1]), tuple(scales[:-1]), rois, pooled,
            sampling_ratio, k_min, k_max - 1, canonical_scale,
            canonical_level, window, rois_per_step, interpret)
    else:
        out_win = multilevel_roi_align_pallas(
            pyramid[:-1], tuple(scales[:-1]), rois, pooled, sampling_ratio,
            k_min, k_max - 1, canonical_scale=canonical_scale,
            canonical_level=canonical_level, window=window,
            rois_per_step=rois_per_step, interpret=interpret)
    out_top = jax.vmap(
        lambda f, r: ra.roi_align(f, r, scales[-1], pooled, pooled,
                                  sampling_ratio)
    )(pyramid[-1], rois)
    lvl = roi_levels(rois.astype(jnp.float32), k_min, k_max,
                     canonical_scale, canonical_level)
    is_top = (lvl == k_max)[..., None, None, None]
    out = jnp.where(is_top, out_top, out_win.astype(out_top.dtype))
    return jnp.swapaxes(out, 2, 3) if out_qp else out
