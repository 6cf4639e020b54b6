"""RoICrop: spatial-transformer bilinear crop (cfg ROI_XFORM_METHOD
'RoICrop').

Rebuilds the reference's CUDA RoICrop (lib/model/roi_crop/src/
roi_crop_cuda_kernel.cu + functions/roi_crop.py + gridgen): an affine
sampling grid over the RoI followed by bilinear interpolation, optionally at
2x resolution followed by 2x2 max-pool (cfg.CROP_RESIZE_WITH_MAX_POOL).

On TPU this is pure XLA: the affine grid is closed-form and the bilinear
sample reuses the dense separable-matmul machinery of ops/roi_align.py
(RoICrop's grid is exactly an axis-aligned affine resample, so the same
(R,P,H)x(H,W,C) contraction applies). Note RoICrop semantics differ from
RoIAlign: grid points span [x1, x2] inclusive via normalized [-1, 1] affine
coords (torch F.affine_grid convention), with zero padding outside.
"""

import functools

import jax
import jax.numpy as jnp


def _crop_axis_weights(starts, ends, pooled, size):
    """Grid coords per output index: affine_grid maps output index p in
    [0, P) to input coordinate via normalized coords. With torch's
    align_corners=True convention used by the reference era:
    coord(p) = start + (end - start) * p / (P - 1)."""
    p = jnp.arange(pooled, dtype=jnp.float32)
    denom = max(pooled - 1, 1)
    coords = starts[:, None] + (ends - starts)[:, None] * p[None, :] / denom
    in_bounds = (coords >= 0.0) & (coords <= size - 1.0)
    cc = jnp.clip(coords, 0.0, size - 1.0)
    idx = jnp.arange(size, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(cc[..., None] - idx))
    return w * in_bounds[..., None]  # (R, P, size)


@functools.partial(jax.jit, static_argnames=("pooled_h", "pooled_w",
                                             "max_pool"))
def roi_crop(feat, rois, spatial_scale, pooled_h, pooled_w, max_pool=True):
    """feat (H, W, C); rois (R, 4) image coords. Matches the reference's
    roi_feature_transform RoICrop branch: grid over the scaled RoI, bilinear
    crop at 2x resolution + 2x2 max pool when cfg.CROP_RESIZE_WITH_MAX_POOL.
    """
    H, W, C = feat.shape
    rois = rois.astype(jnp.float32)
    x1 = rois[:, 0] * spatial_scale
    y1 = rois[:, 1] * spatial_scale
    x2 = rois[:, 2] * spatial_scale
    y2 = rois[:, 3] * spatial_scale

    ph = pooled_h * 2 if max_pool else pooled_h
    pw = pooled_w * 2 if max_pool else pooled_w

    vy = _crop_axis_weights(y1, y2, ph, H)
    vx = _crop_axis_weights(x1, x2, pw, W)
    hi = jax.lax.Precision.HIGHEST
    tmp = jnp.einsum("rph,hwc->rpwc", vy, feat.astype(jnp.float32),
                     precision=hi)
    out = jnp.einsum("rqw,rpwc->rpqc", vx, tmp, precision=hi)
    if max_pool:
        R = out.shape[0]
        out = out.reshape(R, pooled_h, 2, pooled_w, 2, C).max(axis=(2, 4))
    return out.astype(feat.dtype)
