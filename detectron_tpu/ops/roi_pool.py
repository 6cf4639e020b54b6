"""RoIPool (max-pool RoI transform), Caffe2 'RoIPoolF' semantics.

Rebuilds the reference's CUDA RoIPool
(lib/model/roi_pooling/src/roi_pooling_kernel.cu :: RoIPoolFunction):
rounded RoI coordinates, per-bin [floor(p*b), ceil((p+1)*b)) ranges clamped to
the map, max over the bin, 0 for empty bins.

Legacy path: no e2e baseline config uses RoIPoolF (RoIAlign everywhere), so
this favors simplicity over speed — a static scan over feature rows/cols with
bin-membership masks. Differentiable via autodiff of max (subgradient to the
argmax, matching the CUDA backward).
"""

import functools

import jax
import jax.numpy as jnp

NEG = -1e30


@functools.partial(jax.jit, static_argnames=("pooled_h", "pooled_w"))
def roi_pool(feat, rois, spatial_scale, pooled_h, pooled_w):
    """feat: (H, W, C); rois: (R, 4) image coords. -> (R, Ph, Pw, C)."""
    H, W, C = feat.shape
    rois = rois.astype(jnp.float32)
    x1 = jnp.round(rois[:, 0] * spatial_scale)
    y1 = jnp.round(rois[:, 1] * spatial_scale)
    x2 = jnp.round(rois[:, 2] * spatial_scale)
    y2 = jnp.round(rois[:, 3] * spatial_scale)
    roi_w = jnp.maximum(x2 - x1 + 1.0, 1.0)
    roi_h = jnp.maximum(y2 - y1 + 1.0, 1.0)
    bin_w = roi_w / pooled_w
    bin_h = roi_h / pooled_h

    ph = jnp.arange(pooled_h, dtype=jnp.float32)
    pw = jnp.arange(pooled_w, dtype=jnp.float32)
    hstart = jnp.clip(jnp.floor(ph[None] * bin_h[:, None]) + y1[:, None], 0, H)
    hend = jnp.clip(jnp.ceil((ph[None] + 1) * bin_h[:, None]) + y1[:, None],
                    0, H)
    wstart = jnp.clip(jnp.floor(pw[None] * bin_w[:, None]) + x1[:, None], 0, W)
    wend = jnp.clip(jnp.ceil((pw[None] + 1) * bin_w[:, None]) + x1[:, None],
                    0, W)

    hh = jnp.arange(H, dtype=jnp.float32)
    ww = jnp.arange(W, dtype=jnp.float32)
    # Membership masks: (R, Ph, H) and (R, Pw, W)
    my = (hh[None, None, :] >= hstart[..., None]) & \
         (hh[None, None, :] < hend[..., None])
    mx = (ww[None, None, :] >= wstart[..., None]) & \
         (ww[None, None, :] < wend[..., None])

    # Row reduction: tmp[r, p, w, c] = max over member rows h.
    def row_body(h, tmp):
        upd = jnp.where(my[:, :, h, None, None],
                        jnp.maximum(tmp, feat[h][None, None]), tmp)
        return upd

    tmp = jax.lax.fori_loop(
        0, H, row_body,
        jnp.full((rois.shape[0], pooled_h, W, C), NEG, feat.dtype))

    def col_body(w, out):
        upd = jnp.where(mx[:, None, :, w, None],
                        jnp.maximum(out, tmp[:, :, w, :][:, :, None, :]), out)
        return upd

    out = jax.lax.fori_loop(
        0, W, col_body,
        jnp.full((rois.shape[0], pooled_h, pooled_w, C), NEG, feat.dtype))
    # Empty bins -> 0 (Caffe2 semantics)
    return jnp.where(out <= NEG / 2, 0.0, out).astype(feat.dtype)
