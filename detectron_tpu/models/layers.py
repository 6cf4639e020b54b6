"""Functional NN primitives (NHWC / HWIO, TPU-native layouts).

Thin wrappers over lax convolutions plus the Detectron-specific layers:
AffineChannel (frozen BN; reference anchor lib/nn/modules/affine.py ::
AffineChannel2d), GroupNorm with Detectron's group-sizing rule
(lib/utils/net.py :: get_group_gn), and Caffe2-compatible max-pooling.

Params are plain dicts of arrays; every layer is `init_*` + a pure `apply`
function, so the whole model is a pytree + jit-compiled apply (no module
objects, no framework dependency).
"""

import jax
import jax.numpy as jnp
from jax import lax

from detectron_tpu.models import init as finit


# ---------------------------------------------------------------------------
# Conv2D
# ---------------------------------------------------------------------------

def init_conv(rng, kh, kw, in_c, out_c, groups=1, weight_init="MSRAFill",
              bias=True, std=0.01):
    """Conv params: w (kh, kw, in_c//groups, out_c) HWIO, optional b (out_c,)."""
    shape = (kh, kw, in_c // groups, out_c)
    if weight_init == "MSRAFill":
        w = finit.msra_fill(rng, shape)
    elif weight_init == "XavierFill":
        w = finit.xavier_fill(rng, shape)
    elif weight_init == "GaussianFill":
        w = finit.gaussian_fill(rng, shape, std)
    elif weight_init == "Zero":
        w = jnp.zeros(shape, jnp.float32)
    else:
        raise ValueError(weight_init)
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((out_c,), jnp.float32)
    return p


def conv2d(p, x, stride=1, padding="SAME", dilation=1, groups=1):
    """x: (B, H, W, C). padding: 'SAME', 'VALID', int, or explicit pairs."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    w = p["w"].astype(x.dtype)
    y = lax.conv_general_dilated(
        x, w,
        window_strides=stride,
        padding=padding,
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def conv_transpose2d(p, x, stride=2, torch_padding=0):
    """ConvTranspose (deconv), kernel stored HWIO (kh, kw, in_c, out_c).

    `torch_padding` follows torch.nn.ConvTranspose2d semantics
    (out = (in-1)*stride - 2*padding + kernel); the equivalent
    lax.conv_transpose padding is kernel-1-padding per side.
    """
    w = p["w"].astype(x.dtype)
    kh, kw = w.shape[0], w.shape[1]
    pad_h = kh - 1 - torch_padding
    pad_w = kw - 1 - torch_padding
    y = lax.conv_transpose(
        x, w,
        strides=(stride, stride),
        padding=[(pad_h, pad_h), (pad_w, pad_w)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=False,
    )
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


# ---------------------------------------------------------------------------
# Dense
# ---------------------------------------------------------------------------

def init_fc(rng, in_dim, out_dim, weight_init="XavierFill", std=0.01):
    if weight_init == "XavierFill":
        w = finit.xavier_fill(rng, (in_dim, out_dim))
    elif weight_init == "GaussianFill":
        w = finit.gaussian_fill(rng, (in_dim, out_dim), std)
    elif weight_init == "MSRAFill":
        w = finit.msra_fill(rng, (in_dim, out_dim))
    else:
        raise ValueError(weight_init)
    return {"w": w, "b": jnp.zeros((out_dim,), jnp.float32)}


def fc(p, x):
    return x @ p["w"].astype(x.dtype) + p["b"].astype(x.dtype)


# ---------------------------------------------------------------------------
# AffineChannel (frozen BatchNorm)
# ---------------------------------------------------------------------------

def init_affine(channels):
    return {"s": jnp.ones((channels,), jnp.float32),
            "b": jnp.zeros((channels,), jnp.float32)}


def affine_channel(p, x):
    """Per-channel x*s + b — Detectron's frozen-BN replacement. XLA fuses this
    into the preceding conv, realizing BASELINE's 'fused BN-frozen affine'."""
    return x * p["s"].astype(x.dtype) + p["b"].astype(x.dtype)


# ---------------------------------------------------------------------------
# GroupNorm
# ---------------------------------------------------------------------------

def get_group_gn(dim, dim_per_gp, num_groups):
    """Detectron's GN group-count rule (lib/utils/net.py :: get_group_gn)."""
    assert dim_per_gp == -1 or num_groups == -1, \
        "GroupNorm: can only specify G or C/G"
    if dim_per_gp > 0:
        assert dim % dim_per_gp == 0
        return dim // dim_per_gp
    assert dim % num_groups == 0
    return num_groups


def init_group_norm(channels):
    return {"s": jnp.ones((channels,), jnp.float32),
            "b": jnp.zeros((channels,), jnp.float32)}


def group_norm(p, x, num_groups, eps=1e-5):
    """x: (B, H, W, C); normalize over (H, W, C/G) per group."""
    B, H, W, C = x.shape
    g = num_groups
    xf = x.astype(jnp.float32).reshape(B, H, W, g, C // g)
    mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xf, axis=(1, 2, 4), keepdims=True)
    xf = (xf - mean) * lax.rsqrt(var + eps)
    xf = xf.reshape(B, H, W, C)
    return (xf * p["s"] + p["b"]).astype(x.dtype)


# ---------------------------------------------------------------------------
# Pooling
# ---------------------------------------------------------------------------

def max_pool(x, window=3, stride=2, padding=((0, 1), (0, 1))):
    """Caffe-style 3x3/2 max pool. Caffe pads to cover the input fully
    (ceil mode); with 224-x inputs this equals asymmetric (0,1) padding."""
    if isinstance(padding, str):
        pads = padding
    else:
        pads = [(0, 0)] + list(padding) + [(0, 0)]
    return lax.reduce_window(
        x, -jnp.inf if x.dtype in (jnp.float32, jnp.bfloat16) else x.dtype.type(0),
        lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=pads,
    )


def relu(x):
    return jnp.maximum(x, 0)
