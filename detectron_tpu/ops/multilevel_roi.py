"""Gather-based multilevel RoIAlign over a flattened FPN pyramid.

This is the production path for FPN RoI extraction (the dense-matmul
formulation in ops/roi_align.py is exact but materializes an (R, P, W, C)
intermediate — prohibitive at P2 resolution). Here all pyramid levels are
flattened into one (sum_l H_l*W_l, C) tensor; each RoI computes its FPN level
(eq. 1, FPN paper), its bilinear sample coordinates in that level's units,
and gathers the 4 neighbors of each sample point directly from the flat
tensor. RoIs are processed in chunks (lax.map) to bound the gather
intermediate to chunk*samples*4*C elements.

Semantics identical to ops/roi_align.roi_align (Detectron v1 RoIAlign:
no half-pixel offset, roi size floor of 1, zero outside [-1, size],
clamp-to-edge) composed with FPN.map_rois_to_fpn_levels — verified against
the dense implementation in tests/test_multilevel_roi.py.

Reference being replaced: lib/modeling/model_builder.py ::
roi_feature_transform (FPN branch) + collect_and_distribute's per-level
splits + the CUDA RoIAlign kernel.
"""

import functools

import jax
import jax.numpy as jnp

from detectron_tpu.ops import box_ops  # noqa: F401  (doc cross-ref)


def _sample_coords(start, size, pooled, ratio):
    """(R,) start/size -> (R, pooled*ratio) sample coordinates."""
    bin_size = size / pooled  # (R,)
    p = jnp.arange(pooled * ratio, dtype=start.dtype)
    # p = bin*ratio + g  ->  start + bin*bin_size + (g+.5)*bin_size/ratio
    bins = p // ratio
    g = p % ratio
    return start[:, None] + bins[None, :] * bin_size[:, None] + \
        (g[None, :] + 0.5) * bin_size[:, None] / ratio


@functools.partial(
    jax.jit,
    static_argnames=("pooled", "sampling_ratio", "k_min", "k_max", "chunk",
                     "canonical_scale", "canonical_level"),
)
def multilevel_roi_align(pyramid, scales, rois, pooled, sampling_ratio,
                         k_min, k_max, canonical_scale=224,
                         canonical_level=4, chunk=128):
    """pyramid: list of (H_l, W_l, C) for ONE image, ordered k_min..k_max
    (callers slice RPN-only levels like P6 off); scales: matching spatial
    scales; rois: (R, 4) image coords. Returns (R, pooled, pooled, C).
    sampling_ratio must be > 0 (FPN configs use 2)."""
    assert sampling_ratio > 0, "gather path requires a static sampling ratio"
    L = len(pyramid)
    assert L == k_max - k_min + 1
    C = pyramid[0].shape[-1]
    dtype = pyramid[0].dtype

    heights = jnp.asarray([f.shape[0] for f in pyramid], jnp.float32)
    widths = jnp.asarray([f.shape[1] for f in pyramid], jnp.float32)
    sizes = [f.shape[0] * f.shape[1] for f in pyramid]
    offsets = jnp.asarray(
        [sum(sizes[:i]) for i in range(L)], jnp.float32)
    flat = jnp.concatenate([f.reshape(-1, C) for f in pyramid], axis=0)

    # Per-RoI level (eq. 1).
    rois = rois.astype(jnp.float32)
    w = rois[:, 2] - rois[:, 0] + 1.0
    h = rois[:, 3] - rois[:, 1] + 1.0
    s = jnp.sqrt(jnp.maximum(w * h, 1e-12))
    lvl = jnp.clip(
        jnp.floor(canonical_level + jnp.log2(s / canonical_scale + 1e-6)),
        k_min, k_max).astype(jnp.int32) - k_min  # (R,) in [0, L)

    lvl_scale = jnp.asarray(scales, jnp.float32)[lvl]  # (R,)
    Hl = heights[lvl]
    Wl = widths[lvl]
    off = offsets[lvl]
    return _gather_pool(flat, rois, off, Hl, Wl, lvl_scale, pooled,
                        sampling_ratio, chunk, dtype)


@functools.partial(
    jax.jit,
    static_argnames=("pooled", "sampling_ratio", "k_min", "k_max", "chunk",
                     "canonical_scale", "canonical_level"),
)
def multilevel_roi_align_flat(pyramid, scales, rois, img_idx, pooled,
                              sampling_ratio, k_min, k_max,
                              canonical_scale=224, canonical_level=4,
                              chunk=128):
    """Flat-batch variant: pyramid levels are (B, H_l, W_l, C); rois is
    (R, 4) with img_idx (R,) int32 naming each RoI's image. Levels flatten
    image-major per level, so the per-RoI gather base is
    level_offset[lvl] + img_idx * (H_l * W_l). Exact same numerics as
    multilevel_roi_align — used as the ladder's compacted sliver fixup
    (ops/windowed_roi.py) where RoIs from different images mix."""
    assert sampling_ratio > 0, "gather path requires a static sampling ratio"
    L = len(pyramid)
    assert L == k_max - k_min + 1
    C = pyramid[0].shape[-1]
    B = pyramid[0].shape[0]
    dtype = pyramid[0].dtype

    heights = jnp.asarray([f.shape[1] for f in pyramid], jnp.float32)
    widths = jnp.asarray([f.shape[2] for f in pyramid], jnp.float32)
    areas = jnp.asarray([f.shape[1] * f.shape[2] for f in pyramid],
                        jnp.float32)
    sizes = [B * f.shape[1] * f.shape[2] for f in pyramid]
    offsets = jnp.asarray(
        [sum(sizes[:i]) for i in range(L)], jnp.float32)
    flat = jnp.concatenate([f.reshape(-1, C) for f in pyramid], axis=0)

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
    off = offsets[lvl] + img_idx.astype(jnp.float32) * areas[lvl]
    return _gather_pool(flat, rois, off, Hl, Wl, lvl_scale, pooled,
                        sampling_ratio, chunk, dtype)


@functools.partial(
    jax.jit,
    static_argnames=("level_dims", "row_off", "col_off", "pooled",
                     "sampling_ratio", "k_min", "k_max", "chunk",
                     "canonical_scale", "canonical_level"),
)
def multilevel_roi_align_canvas_flat(
        canvas, level_dims, row_off, col_off, scales, rois, img_idx,
        pooled, sampling_ratio, k_min, k_max, canonical_scale=224,
        canonical_level=4, chunk=128):
    """Exact gather RoIAlign reading levels IN PLACE from a packed canvas.

    Identical numerics to multilevel_roi_align_flat, but instead of
    re-concatenating the pyramid into a fresh flat tensor (a full
    pyramid-sized HBM copy — 8.3 ms/step at Mask R-CNN batch-48 shapes,
    measured round 4), samples gather directly from the (B, Hc, Wc, C)
    canvas the ladder already built: level l of image b lives at rows
    [row_off[l], row_off[l]+H_l) and cols [col_off[l], col_off[l]+W_l) of
    canvas[b]. Sample clamping stays inside the level's own dims, so the
    canvas' zero padding is never read and bit-exactness vs the flat
    gather holds (tests/test_roi_ladder.py).

    canvas: (B, Hc, Wc, C); level_dims: static ((H_l, W_l), ...);
    row_off/col_off: static per-level canvas offsets (col_off may be all
    zeros for the row-stacked 1-D canvas); rois: (R, 4) image coords with
    img_idx (R,) int32. Returns (R, pooled, pooled, C)."""
    assert sampling_ratio > 0, "gather path requires a static sampling ratio"
    L = len(level_dims)
    assert L == k_max - k_min + 1
    B, Hc, Wc, C = canvas.shape
    dtype = canvas.dtype
    flat = canvas.reshape(-1, C)

    heights = jnp.asarray([d[0] for d in level_dims], jnp.float32)
    widths = jnp.asarray([d[1] for d in level_dims], jnp.float32)
    row_off = jnp.asarray(row_off, jnp.float32)
    col_off = jnp.asarray(col_off, jnp.float32)

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
    off = ((img_idx.astype(jnp.float32) * Hc + row_off[lvl]) * Wc
           + col_off[lvl])
    return _gather_pool(flat, rois, off, Hl, Wl, lvl_scale, pooled,
                        sampling_ratio, chunk, dtype, row_stride=float(Wc))


def _gather_pool(flat, rois, off, Hl, Wl, lvl_scale, pooled, sampling_ratio,
                 chunk, dtype, row_stride=None):
    """row_stride: flat elements per feature row (default: the level's own
    width Wl — a contiguously flattened level). Canvas-backed callers pass
    the canvas width so samples index into a level living at an offset
    inside a wider packed canvas (multilevel_roi_align_canvas_flat)."""
    C = flat.shape[-1]
    x1 = rois[:, 0] * lvl_scale
    y1 = rois[:, 1] * lvl_scale
    roi_w = jnp.maximum((rois[:, 2] - rois[:, 0]) * lvl_scale, 1.0)
    roi_h = jnp.maximum((rois[:, 3] - rois[:, 1]) * lvl_scale, 1.0)

    S = pooled * sampling_ratio
    ys = _sample_coords(y1, roi_h, pooled, sampling_ratio)  # (R, S)
    xs = _sample_coords(x1, roi_w, pooled, sampling_ratio)  # (R, S)

    in_y = (ys >= -1.0) & (ys <= Hl[:, None])
    in_x = (xs >= -1.0) & (xs <= Wl[:, None])
    yc = jnp.clip(ys, 0.0, Hl[:, None] - 1.0)
    xc = jnp.clip(xs, 0.0, Wl[:, None] - 1.0)

    y0 = jnp.floor(yc)
    x0 = jnp.floor(xc)
    ly = yc - y0
    lx = xc - x0
    y1i = jnp.minimum(y0 + 1.0, Hl[:, None] - 1.0)
    x1i = jnp.minimum(x0 + 1.0, Wl[:, None] - 1.0)

    base = off[:, None]
    stride = Wl if row_stride is None else \
        jnp.broadcast_to(jnp.asarray(row_stride, jnp.float32), Wl.shape)
    # Flat indices for the 4 neighbors of each (y, x) sample pair.
    def flat_idx(yy, xx):
        # (R, S) x (R, S) -> (R, S, S)
        return (base[..., None] + yy[:, :, None] * stride[:, None, None]
                + xx[:, None, :]).astype(jnp.int32)

    i00 = flat_idx(y0, x0)
    i01 = flat_idx(y0, x1i)
    i10 = flat_idx(y1i, x0)
    i11 = flat_idx(y1i, x1i)

    wy0 = (1.0 - ly) * in_y  # (R, S)
    wy1 = ly * in_y
    wx0 = (1.0 - lx) * in_x
    wx1 = lx * in_x

    w00 = (wy0[:, :, None] * wx0[:, None, :]).astype(dtype)
    w01 = (wy0[:, :, None] * wx1[:, None, :]).astype(dtype)
    w10 = (wy1[:, :, None] * wx0[:, None, :]).astype(dtype)
    w11 = (wy1[:, :, None] * wx1[:, None, :]).astype(dtype)

    R = rois.shape[0]
    n_chunks = max(1, -(-R // chunk))
    pad = n_chunks * chunk - R

    def pad0(a):
        return jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1)) if pad else a

    args = jax.tree.map(pad0, (i00, i01, i10, i11, w00, w01, w10, w11))
    args = jax.tree.map(
        lambda a: a.reshape((n_chunks, chunk) + a.shape[1:]), args)

    def do_chunk(a):
        ii00, ii01, ii10, ii11, ww00, ww01, ww10, ww11 = a
        # (chunk, S, S, C) weighted sum of 4 gathers
        v = flat[ii00] * ww00[..., None]
        v += flat[ii01] * ww01[..., None]
        v += flat[ii10] * ww10[..., None]
        v += flat[ii11] * ww11[..., None]
        # Average the sampling grid within each bin.
        cs = v.reshape(chunk, pooled, sampling_ratio, pooled,
                       sampling_ratio, C)
        return jnp.mean(cs, axis=(2, 4))

    out = jax.lax.map(do_chunk, args)
    out = out.reshape(n_chunks * chunk, pooled, pooled, C)
    return out[:R]
