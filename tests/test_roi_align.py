import numpy as np
import jax
import jax.numpy as jnp

from detectron_tpu.ops import roi_align as ra


def _bilinear(feat, y, x):
    """Caffe2 roi_align bilinear_interpolate semantics (numpy oracle)."""
    H, W = feat.shape[:2]
    if y < -1.0 or y > H or x < -1.0 or x > W:
        return np.zeros(feat.shape[2:], feat.dtype)
    y = min(max(y, 0.0), H - 1)
    x = min(max(x, 0.0), W - 1)
    y0, x0 = int(y), int(x)
    y1, x1 = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
    ly, lx = y - y0, x - x0
    return (
        feat[y0, x0] * (1 - ly) * (1 - lx)
        + feat[y0, x1] * (1 - ly) * lx
        + feat[y1, x0] * ly * (1 - lx)
        + feat[y1, x1] * ly * lx
    )


def _roi_align_oracle(feat, rois, scale, ph, pw, sampling_ratio, grid_cap=4):
    R = rois.shape[0]
    C = feat.shape[2]
    out = np.zeros((R, ph, pw, C), np.float64)
    for r in range(R):
        x1, y1, x2, y2 = rois[r] * scale
        rw = max(x2 - x1, 1.0)
        rh = max(y2 - y1, 1.0)
        bw, bh = rw / pw, rh / ph
        gh = sampling_ratio if sampling_ratio > 0 else min(
            grid_cap, max(1, int(np.ceil(rh / ph)))
        )
        gw = sampling_ratio if sampling_ratio > 0 else min(
            grid_cap, max(1, int(np.ceil(rw / pw)))
        )
        for i in range(ph):
            for j in range(pw):
                acc = np.zeros(C, np.float64)
                for iy in range(gh):
                    yy = y1 + i * bh + (iy + 0.5) * bh / gh
                    for ix in range(gw):
                        xx = x1 + j * bw + (ix + 0.5) * bw / gw
                        acc += _bilinear(feat, yy, xx)
                out[r, i, j] = acc / (gh * gw)
    return out


def test_roi_align_matches_oracle_fixed_ratio():
    rng = np.random.RandomState(0)
    feat = rng.randn(25, 32, 8).astype(np.float32)
    rois = np.array(
        [
            [0, 0, 100, 100],
            [37.3, 11.2, 200.9, 150.4],
            [5, 5, 20, 60],
            [300, 300, 400, 380],  # partially outside the feature map
        ],
        dtype=np.float32,
    )
    out = ra.roi_align(jnp.asarray(feat), jnp.asarray(rois), 1.0 / 16,
                       pooled_h=7, pooled_w=7, sampling_ratio=2)
    ref = _roi_align_oracle(feat, rois, 1.0 / 16, 7, 7, 2)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_roi_align_matches_oracle_adaptive():
    rng = np.random.RandomState(1)
    feat = rng.randn(38, 50, 4).astype(np.float32)
    rois = np.array(
        [
            [0, 0, 790, 590],   # huge RoI -> adaptive grid hits the cap
            [10, 10, 80, 40],   # small RoI -> grid 1
            [100, 50, 400, 300],
        ],
        dtype=np.float32,
    )
    out = ra.roi_align(jnp.asarray(feat), jnp.asarray(rois), 1.0 / 16,
                       pooled_h=14, pooled_w=14, sampling_ratio=0, grid_cap=4)
    ref = _roi_align_oracle(feat, rois, 1.0 / 16, 14, 14, 0, grid_cap=4)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_roi_align_differentiable():
    rng = np.random.RandomState(2)
    feat = jnp.asarray(rng.randn(16, 16, 2).astype(np.float32))
    rois = jnp.asarray(np.array([[8.0, 8.0, 120.0, 120.0]], np.float32))

    def loss(f):
        return jnp.sum(
            ra.roi_align(f, rois, 1.0 / 16, pooled_h=7, pooled_w=7,
                         sampling_ratio=2) ** 2
        )

    g = jax.grad(loss)(feat)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_roi_align_batched():
    rng = np.random.RandomState(3)
    feats = jnp.asarray(rng.randn(2, 16, 16, 3).astype(np.float32))
    rois = jnp.asarray(
        rng.uniform(0, 200, (2, 5, 4)).astype(np.float32)
    )
    rois = rois.at[..., 2:].set(rois[..., :2] + 50)
    out = ra.roi_align_batched(feats, rois, 1.0 / 16, 7, 7, 2)
    assert out.shape == (2, 5, 7, 7, 3)
