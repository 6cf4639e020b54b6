"""Pallas TPU kernel fusing the ResNet res2 stage into one HBM pass.

Why: at the bench shapes (batch 48, 832x1344 canvas) the res2 stage's
activations are 430 MB (64ch) / 1.7 GB (256ch) per tensor, and XLA runs
each of its 10 convolutions as a separate HBM-bound op — round-4 xprof
measured ~40 ms/step of stem+res2 convs pinned at 565-700 GB/s and
2-60 TF/s (PERF.md). The whole stage reads its input once and writes its
output once; everything between fits in VMEM a row-tile at a time. This
kernel runs all three bottleneck blocks (1x1 -> 3x3 -> 1x1 + shortcut,
frozen-BN affine folded into the conv weights) on a y-tile of the image
per grid step, cutting stage HBM traffic from ~21 GB to ~2.2 GB per
batch-48 step.

Reference anchor: lib/modeling/ResNet.py :: add_stage / res2 (semantics);
the kernelization is TPU-original.

Design notes (per the TPU kernel guide):
- Grid (B, n_y_tiles); input row-halo (3 rows per side: one per 3x3 conv)
  comes from passing the SAME input three times with prev/cur/next block
  index maps — the Pallas pipeline double-buffers the blocks, no manual
  DMA needed. Edge tiles zero their missing halo rows (conv SAME padding).
- Each 3x3 conv is 3 accumulated matmuls over an x-only im2col
  (K = 3 taps * 64 ch = 192): full-K MXU utilization without the 9x
  VMEM blowup of a full 576-wide im2col.
- Block 0's branch2c and branch1 (shortcut) 1x1 convs share one matmul:
  inputs concatenated on K (128), weights stacked — N=256 at full K.
- Matmul accumulation is f32 (Mosaic requires f32 accumulators); each
  conv's result is cast back to the activation dtype before the next op,
  matching the XLA path's inter-op bf16 rounding.
"""

import contextlib
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tests force interpret mode (CPU has no Mosaic); production leaves this off.
_FORCE_INTERPRET = False


@contextlib.contextmanager
def force_interpret():
    global _FORCE_INTERPRET
    prev = _FORCE_INTERPRET
    _FORCE_INTERPRET = True
    try:
        yield
    finally:
        _FORCE_INTERPRET = prev


def pick_ty(h, w):
    """Largest legal y-tile for a (h, w) post-stem-pool canvas, or None when
    the kernel's static constraints don't hold (caller falls back to the XLA
    stage). 8 rows ~ 1 MB/input block at W=336: deep enough to amortize the
    6 halo rows, small enough that double-buffered blocks + f32 accumulators
    stay inside the 16 MB VMEM scope."""
    if w % 16 != 0:
        return None
    for ty in (8, 4):
        if h % ty == 0:
            return ty
    return None


def res2_params_supported(stage_params):
    """The kernel handles exactly the canonical frozen res2: 3 bottleneck
    blocks, 64->256 with inner 64, ungrouped 3x3s, AffineChannel norm."""
    if len(stage_params) != 3:
        return False
    for i, bp in enumerate(stage_params):
        if "branch2a_bn" not in bp or "s" not in bp["branch2a_bn"]:
            return False  # GroupNorm trees carry different leaves
        wa, wb, wc = (bp[k]["w"] for k in ("branch2a", "branch2b",
                                           "branch2c"))
        if wa.shape != (1, 1, 64 if i == 0 else 256, 64):
            return False
        if wb.shape != (3, 3, 64, 64) or wc.shape != (1, 1, 64, 256):
            return False
        if (i == 0) != ("branch1" in bp):
            return False
    return True


def fold_conv_affine(conv_p, bn_p, dtype):
    """Fold a frozen-BN AffineChannel (y = conv(x)*s + b) into the conv:
    w' = w * s (out-channel scale), bias = b. Returns (w', b') with w' in
    the activation dtype (matmul operand) and b' f32 (accumulator add)."""
    w = conv_p["w"].astype(jnp.float32) * bn_p["s"].astype(jnp.float32)
    b = bn_p["b"].astype(jnp.float32)
    if "b" in conv_p:
        b = b + conv_p["b"].astype(jnp.float32) * bn_p["s"].astype(
            jnp.float32)
    return w.astype(dtype), b


def fold_res2_weights(stage_params, dtype):
    """Flatten the 3 bottleneck blocks' conv+affine params into the kernel's
    operand list. Returns a list of arrays in kernel order:

      [wa0, ba0, wb0, bb0, wcs0, bcs0,    # block 0 (branch1 merged into cs)
       wa1, ba1, wb1, bb1, wc1, bc1,      # block 1
       wa2, ba2, wb2, bb2, wc2, bc2]      # block 2

    wa: (Cin, 64) 1x1 branch2a; wb: (3, 3*64, 64) per-dy x-im2col branch2b
    (row order = (dx, c)); wc: (64, 256) branch2c; block 0's wcs0 stacks
    [branch2c; branch1] -> (128, 256) so both 1x1s run as one full-K
    matmul. Biases are f32 (1, C) rows (added on the f32 accumulator).
    """
    ops = []
    for i, bp in enumerate(stage_params):
        wa, ba = fold_conv_affine(bp["branch2a"], bp["branch2a_bn"], dtype)
        wb, bb = fold_conv_affine(bp["branch2b"], bp["branch2b_bn"], dtype)
        wc, bc = fold_conv_affine(bp["branch2c"], bp["branch2c_bn"], dtype)
        ops += [wa[0, 0], ba[None, :], wb.reshape(3, 3 * wb.shape[2],
                                                  wb.shape[3]), bb[None, :]]
        if i == 0:
            ws, bs = fold_conv_affine(bp["branch1"], bp["branch1_bn"], dtype)
            ops += [jnp.concatenate([wc[0, 0], ws[0, 0]], axis=0),
                    (bc + bs)[None, :]]
        else:
            ops += [wc[0, 0], bc[None, :]]
    return ops


def _conv1x1(x, w, b, relu=True):
    """x: (R, W, Cin) -> (R, W, Cout); f32 accumulate, cast to x.dtype."""
    R, W, Cin = x.shape
    y = jax.lax.dot_general(
        x.reshape(R * W, Cin), w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype).reshape(R, W, w.shape[1])


def _conv3x3(x, w3, b, relu=True):
    """SAME-x / VALID-y 3x3 conv: x (R, W, C) -> (R-2, W, Cout) via 3
    accumulated matmuls over an x-only im2col (K = 3*C).

    The +-1-column taps come from pltpu.roll + edge masking rather than
    shifted slices of a padded copy: Mosaic cannot concatenate vectors
    whose lane offsets differ ("result/input offset mismatch on non-concat
    dimension"), and a rotate keeps every operand at offset 0. The rotate
    itself only supports 32-bit lanes ("Rotate with non-32-bit data"), so
    bf16 tiles round-trip through f32 for the shift."""
    R, W, C = x.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (R, W, C), 1)
    xf = x.astype(jnp.float32)
    xm1 = jnp.where(col > 0, pltpu.roll(xf, 1, 1),
                    0.0).astype(x.dtype)                  # x[j-1]
    xp1 = jnp.where(col < W - 1, pltpu.roll(xf, W - 1, 1),
                    0.0).astype(x.dtype)                  # x[j+1]
    imx = jnp.concatenate([xm1, x, xp1], axis=-1)
    acc = b.astype(jnp.float32)
    for dy in range(3):
        acc = acc + jax.lax.dot_general(
            imx[dy:dy + R - 2].reshape((R - 2) * W, 3 * C), w3[dy],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    return acc.astype(x.dtype).reshape(R - 2, W, w3.shape[2])


def _kernel(xp_ref, xc_ref, xn_ref,
            wa0, ba0, wb0, bb0, wcs0, bcs0,
            wa1, ba1, wb1, bb1, wc1, bc1,
            wa2, ba2, wb2, bb2, wc2, bc2,
            out_ref, *, ty):
    t = pl.program_id(1)
    nty = pl.num_programs(1)
    (wa0, ba0, wb0, bb0, wcs0, bcs0, wa1, ba1, wb1, bb1, wc1, bc1,
     wa2, ba2, wb2, bb2, wc2, bc2) = (
        r[...] for r in (wa0, ba0, wb0, bb0, wcs0, bcs0, wa1, ba1, wb1,
                         bb1, wc1, bc1, wa2, ba2, wb2, bb2, wc2, bc2))

    # Assemble the haloed tile (ty+6 rows): 3 rows from the previous block,
    # the tile, 3 from the next. Edge tiles read a clamped duplicate block;
    # the select zeroes it (SAME conv zero padding).
    zero = jnp.zeros((), xc_ref.dtype)
    top = jnp.where(t > 0, xp_ref[0, ty - 3:ty], zero)
    bot = jnp.where(t + 1 < nty, xn_ref[0, 0:3], zero)
    xt = jnp.concatenate([top, xc_ref[0], bot], axis=0)  # (ty+6, W, 64)

    def zero_edge_rows(x, n):
        """Zero the n out-of-image halo rows at each edge tile: the
        BN-folded 1x1 turns zero input rows into relu(bias) != 0, but the
        XLA path's 3x3 SAME-pads its INPUT (the post-1x1 activation) with
        true zeros at image edges — so each 3x3's input halo rows that lie
        outside the image must be re-zeroed after the 1x1."""
        R = x.shape[0]
        row = jax.lax.broadcasted_iota(jnp.int32, (R, 1, 1), 0)
        lo = jnp.where(t == 0, n, 0)
        hi = R - jnp.where(t + 1 == nty, n, 0)
        return jnp.where((row >= lo) & (row < hi), x, zero)

    # Block 0: branch2c and branch1 (shortcut from xt) share one matmul
    # on the K-concatenated inputs; the sum lands pre-cast in f32 (the XLA
    # path adds two bf16 conv outputs — tolerance covered by tests).
    a0 = zero_edge_rows(_conv1x1(xt, wa0, ba0), 3)   # (ty+6, W, 64)
    b0 = _conv3x3(a0, wb0, bb0)                      # (ty+4, W, 64)
    cat0 = jnp.concatenate([b0, xt[1:ty + 5]], axis=-1)
    h0 = _conv1x1(cat0, wcs0, bcs0)                  # (ty+4, W, 256)

    # Block 1 (identity shortcut; add in activation dtype like XLA).
    a1 = zero_edge_rows(_conv1x1(h0, wa1, ba1), 2)
    b1 = _conv3x3(a1, wb1, bb1)                      # (ty+2, W, 64)
    c1 = _conv1x1(b1, wc1, bc1, relu=False)
    h1 = jnp.maximum(c1 + h0[1:ty + 3], 0.0)         # (ty+2, W, 256)

    # Block 2.
    a2 = zero_edge_rows(_conv1x1(h1, wa2, ba2), 1)
    b2 = _conv3x3(a2, wb2, bb2)                      # (ty, W, 64)
    c2 = _conv1x1(b2, wc2, bc2, relu=False)
    out_ref[0] = jnp.maximum(c2 + h1[1:ty + 1], 0.0)


def fused_res2(x, weights, ty=8, interpret=None):
    """Resolve the test-only interpret override OUTSIDE the jit boundary
    (a global read inside the traced body would be baked into the cache)."""
    if interpret is None:
        interpret = _FORCE_INTERPRET
    return _fused_res2(x, tuple(weights), ty=ty, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("ty", "interpret"))
def _fused_res2(x, weights, ty, interpret):
    """x: (B, H, W, 64) post-stem-pool activations; weights: the
    fold_res2_weights list. Returns (B, H, W, 256) = res2 stage output.
    H must be a multiple of ty; W a multiple of 16 (sublane-legal
    reshapes). Forward-only: res2 is frozen in every reference config
    (RESNETS.FREEZE_AT >= 2) — the caller falls back to the XLA stage
    when gradients could flow (see models/resnet.py)."""
    B, H, W, Cin = x.shape
    assert H % ty == 0 and W % 16 == 0, (x.shape, ty)
    nty = H // ty
    Cout = weights[4].shape[1]

    def xmap(off):
        def m(b, t):
            return (b, jnp.clip(t + off, 0, nty - 1), 0, 0)
        return m

    wspecs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weights]
    return pl.pallas_call(
        functools.partial(_kernel, ty=ty),
        grid=(B, nty),
        in_specs=[
            pl.BlockSpec((1, ty, W, Cin), xmap(-1), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ty, W, Cin), xmap(0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ty, W, Cin), xmap(+1), memory_space=pltpu.VMEM),
        ] + wspecs,
        out_specs=pl.BlockSpec((1, ty, W, Cout), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype),
        interpret=interpret,
    )(x, x, x, *weights)
