"""Weight initializers with Caffe2 fan semantics.

Matches the reference's lib/nn/init.py (XavierFill, MSRAFill), which in turn
copies Caffe2:

- XavierFill: uniform(-s, s) with s = sqrt(3 / fan_in)
- MSRAFill:   normal(0, sqrt(2 / fan_out))
- GaussianFill(std): normal(0, std)

Fan computation for a conv kernel of shape (kh, kw, in_c/groups, out_c)
(HWIO, the JAX-native layout): fan_in = kh*kw*in_c/groups,
fan_out = kh*kw*out_c/groups? — Caffe2 computes fans from the OIHW blob as
fan_in = I*kh*kw and fan_out = O*kh*kw (per-group blobs already have the
divided channel counts), which is what we use.

From-scratch training parity depends on these exact rules
(reference anchor: lib/nn/init.py :: XavierFill / MSRAFill).
"""

import jax
import jax.numpy as jnp
import numpy as np


def _fans(shape):
    """fan_in/fan_out for HWIO conv kernels or (in, out) dense kernels."""
    if len(shape) == 4:
        kh, kw, in_c, out_c = shape
        rf = kh * kw
        return in_c * rf, out_c * rf
    elif len(shape) == 2:
        return shape[0], shape[1]
    raise ValueError("Unsupported kernel shape {}".format(shape))


def xavier_fill(rng, shape, dtype=jnp.float32):
    fan_in, _ = _fans(shape)
    scale = np.sqrt(3.0 / fan_in)
    return jax.random.uniform(rng, shape, dtype, minval=-scale, maxval=scale)


def msra_fill(rng, shape, dtype=jnp.float32):
    _, fan_out = _fans(shape)
    std = np.sqrt(2.0 / fan_out)
    return std * jax.random.normal(rng, shape, dtype)


def gaussian_fill(rng, shape, std, dtype=jnp.float32):
    return std * jax.random.normal(rng, shape, dtype)


def constant_fill(shape, value=0.0, dtype=jnp.float32):
    return jnp.full(shape, value, dtype)


def bilinear_upsample_kernel(factor, channels, dtype=jnp.float32):
    """Frozen bilinear deconv kernel (HWIO, depthwise layout: (k, k, 1, C))
    used by the keypoint head's BilinearInterpolation2d
    (reference anchor: lib/nn/modules/upsample.py)."""
    k = 2 * factor - factor % 2
    center = (2 * factor - 1 - factor % 2) / (2.0 * factor)
    og = np.ogrid[:k, :k]
    filt = (1 - abs(og[0] / factor - center)) * (1 - abs(og[1] / factor - center))
    kern = np.zeros((k, k, 1, channels), dtype=np.float32)
    for c in range(channels):
        kern[:, :, 0, c] = filt
    return jnp.asarray(kern, dtype)
