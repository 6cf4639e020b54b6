"""RoIAlign as MXU matmuls (TPU-native formulation).

Reproduces the numeric semantics of the reference's CUDA RoIAlign
(lib/modeling/roi_xfrom/roi_align/src/roi_align_kernel.cu ::
ROIAlignForwardLaucher, Detectron v1 semantics — *no* half-pixel offset,
roi_width = max(x2*s - x1*s, 1), boundary rule: sample is zero outside
[-1, H] and coordinates clamp to [0, H-1]).

Instead of per-sample gathers (the CUDA design), bilinear sampling separates
per axis into dense interpolation matrices:

    out[r, p, q, c] = sum_h sum_w  Vy[r, p, h] * Vx[r, q, w] * feat[h, w, c]

where Vy[r, p, h] = (1/G) * sum_iy max(0, 1 - |y(r,p,iy) - h|) already folds
the sampling-grid average. The two contractions are plain matmuls, so the
whole op (and its transpose — i.e. the backward pass, via JAX autodiff of the
einsums) runs on the systolic array with zero gather/scatter traffic. For
adaptive sampling (cfg ROI_XFORM_SAMPLING_RATIO == 0 => grid =
ceil(roi_size/pooled_size)), a static cap G with masked samples keeps shapes
fixed while matching the adaptive semantics for all RoIs whose grid fits the
cap.

Shapes: feat (H, W, C) channels-last, rois (R, 4) in image coordinates.
Batch via jax.vmap.
"""

import functools

import jax
import jax.numpy as jnp


def _axis_weights(starts, bin_sizes, grid_counts, pooled, grid_cap, size):
    """Interpolation weights for one axis.

    starts: (R,) roi start (feature coords); bin_sizes: (R,); grid_counts:
    (R,) int, actual samples per bin (<= grid_cap). Returns (R, pooled, size)
    weights with the 1/grid average folded in, plus zeroing of out-of-bounds
    samples.
    """
    p = jnp.arange(pooled, dtype=starts.dtype)  # (P,)
    g = jnp.arange(grid_cap, dtype=starts.dtype)  # (G,)
    gc = grid_counts.astype(starts.dtype)[:, None, None]  # (R,1,1)
    # Sample coordinate: start + p*bin + (g+.5)*bin/grid_count
    coords = (
        starts[:, None, None]
        + p[None, :, None] * bin_sizes[:, None, None]
        + (g[None, None, :] + 0.5) * bin_sizes[:, None, None] / gc
    )  # (R, P, G)
    in_grid = g[None, None, :] < gc  # samples beyond the actual grid: masked
    in_bounds = (coords >= -1.0) & (coords <= size)
    cc = jnp.clip(coords, 0.0, size - 1.0)

    idx = jnp.arange(size, dtype=starts.dtype)  # (S,)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(cc[..., None] - idx))  # (R, P, G, S)
    w = jnp.where((in_grid & in_bounds)[..., None], w, 0.0)
    return jnp.sum(w, axis=2) / gc  # (R, P, S)


@functools.partial(
    jax.jit,
    static_argnames=("pooled_h", "pooled_w", "sampling_ratio", "grid_cap"),
)
def roi_align(feat, rois, spatial_scale, pooled_h, pooled_w,
              sampling_ratio=0, grid_cap=4):
    """RoIAlign, Detectron v1 semantics.

    Args:
      feat: (H, W, C) feature map.
      rois: (R, 4) [x1, y1, x2, y2] in image coordinates. Padded RoIs may be
        all-zero; they produce a harmless pooled patch of the feature corner
        that downstream masking discards.
      spatial_scale: feature stride reciprocal (e.g. 1/16).
      pooled_h, pooled_w: output bin counts (static).
      sampling_ratio: samples per bin per axis; 0 = adaptive
        ceil(roi_size/pooled), capped at grid_cap (static).
      grid_cap: static cap for the adaptive grid.

    Returns:
      (R, pooled_h, pooled_w, C)
    """
    H, W, C = feat.shape
    rois = rois.astype(jnp.float32)
    x1 = rois[:, 0] * spatial_scale
    y1 = rois[:, 1] * spatial_scale
    x2 = rois[:, 2] * spatial_scale
    y2 = rois[:, 3] * spatial_scale
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)
    bin_w = roi_w / pooled_w
    bin_h = roi_h / pooled_h

    if sampling_ratio > 0:
        G = sampling_ratio
        gh = jnp.full(rois.shape[:1], G, dtype=jnp.int32)
        gw = gh
    else:
        G = grid_cap
        gh = jnp.clip(jnp.ceil(roi_h / pooled_h), 1, G).astype(jnp.int32)
        gw = jnp.clip(jnp.ceil(roi_w / pooled_w), 1, G).astype(jnp.int32)

    vy = _axis_weights(y1, bin_h, gh, pooled_h, G, H)  # (R, P, H)
    vx = _axis_weights(x1, bin_w, gw, pooled_w, G, W)  # (R, Q, W)

    f32 = jnp.float32
    # Precision follows the input dtype. bf16 features (the production
    # TPU.COMPUTE_DTYPE): bf16 operands + f32 accumulation — the same
    # numeric contract as the Pallas windowed kernel (which also takes bf16
    # interpolation weights), and ~8x the MXU rate of f32/HIGHEST (measured
    # 28.4 -> ~4 ms for the hybrid's dense top level at batch 32). f32
    # features (host parity tests, C4 eval at f32): full-precision passes.
    if feat.dtype == jnp.bfloat16:
        prec = jax.lax.Precision.DEFAULT
        vy = vy.astype(jnp.bfloat16)
        vx = vx.astype(jnp.bfloat16)
        f = feat
    else:
        prec = jax.lax.Precision.HIGHEST
        f = feat.astype(f32)
    # (R, P, H) x (H, W*C) -> (R, P, W, C): one big MXU matmul. Written as
    # an explicit reshape+dot (not einsum): under the callers' vmap, XLA
    # lowered the einsum to a degenerate convolution running at ~8% MXU
    # (xprof: convolution_convert_fusion, 7.5 ms/step at batch 32); the
    # reshaped dot lowers to a clean batched matmul.
    R = vy.shape[0]
    P = vy.shape[1]
    tmp = jax.lax.dot_general(
        vy.reshape(R * P, H), f.reshape(H, W * C),
        (((1,), (0,)), ((), ())),
        preferred_element_type=f32, precision=prec).reshape(R, P, W, C)
    # (R, Q, W) x (R, P, W, C) -> (R, P, Q, C): batched matmul over R.
    # tmp stays f32, matching the Pallas windowed kernel (its t1
    # intermediate is f32 into the second matmul): only the first,
    # expensive contraction runs on bf16 operands. Precision must be
    # raised here — at DEFAULT, XLA truncates f32 MXU operands to bf16,
    # which would silently reintroduce the extra rounding step. This
    # contraction is ~H/Q ~ 6x cheaper than the first, so HIGHEST is
    # affordable.
    out = jnp.einsum("rqw,rpwc->rpqc", vx.astype(f32), tmp,
                     preferred_element_type=f32,
                     precision=jax.lax.Precision.HIGHEST)
    return out.astype(feat.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("pooled_h", "pooled_w", "sampling_ratio", "grid_cap",
                     "chunk"),
)
def roi_align_chunked(feat, rois, spatial_scale, pooled_h, pooled_w,
                      sampling_ratio=0, grid_cap=4, chunk=64):
    """roi_align with the RoI dim processed in lax.map chunks, bounding the
    (chunk, P, W, C) matmul intermediate (the unchunked op would materialize
    R*P*W*C floats — several GB at production sizes)."""
    R = rois.shape[0]
    n_chunks = max(1, -(-R // chunk))
    pad = n_chunks * chunk - R
    rois_p = jnp.pad(rois, ((0, pad), (0, 0))) if pad else rois
    rois_c = rois_p.reshape(n_chunks, chunk, 4)

    def one(rc):
        return roi_align(feat, rc, spatial_scale, pooled_h, pooled_w,
                         sampling_ratio, grid_cap)

    out = jax.lax.map(one, rois_c)
    out = out.reshape((n_chunks * chunk,) + out.shape[2:])
    return out[:R]


def roi_align_batched(feats, rois, spatial_scale, pooled_h, pooled_w,
                      sampling_ratio=0, grid_cap=4, chunk=None):
    """vmap over a leading batch dim: feats (B,H,W,C), rois (B,R,4)."""
    if chunk:
        fn = functools.partial(
            roi_align_chunked,
            pooled_h=pooled_h,
            pooled_w=pooled_w,
            sampling_ratio=sampling_ratio,
            grid_cap=grid_cap,
            chunk=chunk,
        )
    else:
        fn = functools.partial(
            roi_align,
            pooled_h=pooled_h,
            pooled_w=pooled_w,
            sampling_ratio=sampling_ratio,
            grid_cap=grid_cap,
        )
    return jax.vmap(fn, in_axes=(0, 0, None))(feats, rois, spatial_scale)
