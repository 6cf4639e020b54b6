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

X-PAIR PACKED LAYOUT (v2 — the round-5 redesign of the kernel whose first
version measured SLOWER than XLA's bandwidth-bound schedule, PERF.md
round-5 post-mortem): res2's inner width is 64 channels, half a lane tile,
so v1's tiles wasted half of every VPU op and its matmuls half the MXU
columns (N=64), and the 3x3's +-1-column taps cost two bf16->f32->bf16
pltpu.roll round-trips per conv. v2 packs x-column PAIRS into lanes:
activation (R, W, C) is viewed as (R, W/2, 2C). For row-major bytes this
reshape is a bitcast (x*C + c == u*2C + (p*C + c) with x = 2u+p) — but
TPU HBM arrays are TILED, so XLA materializes the jit-level reshape as an
HBM relayout copy (~12 ms/step at batch 64, measured; PERF.md round-5).
v2.1 therefore streams UNPACKED blocks through the pallas_call boundary
and packs/unpacks in VMEM inside the kernel (_pack_x/_unpack_x — vreg
relayouts, no HBM traffic); boundary="hbm" keeps the v2 behavior for A/B.
Consequences of the packed compute layout either way:

- every intermediate has >= 128 lanes: no padded-lane VPU/VMEM waste;
- 1x1 convs become block-diagonal matmuls at K,N >= 128 (same MXU cycles
  as v1's N=64 — the zeros pad exactly what the empty columns padded —
  but the operands are lane-dense);
- the 3x3's x-taps become MATMUL STRUCTURE: out[u] = sum_du in[u+du] @
  Wp[dy][du] over du in {-1,0,+1} with (128,128) packed weights built
  from the 3 x-taps. The kernel computes the three partial products
  UNSHIFTED and shifts two of the f32 ACCUMULATORS by one packed column
  (pltpu.roll on f32 — natively 32-bit, no dtype round-trip), masking the
  wrapped edge column. Two rolls per 3x3 total (vs v1's two rolls + two
  f32 casts per conv on half-empty tiles).
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
    stage). w % 16: the packed width U = w/2 must be a sublane multiple (8)
    for the (R, U, lanes) reshapes. 8 rows ~ 1 MB/input block at W=336: deep
    enough to amortize the 6 halo rows, small enough that double-buffered
    blocks + f32 accumulators stay inside the 16 MB VMEM scope."""
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


def _bd2(w):
    """1x1 weight (Cin, Co) -> x-pair block-diagonal (2Cin, 2Co): packed
    input lane p*Cin+ci maps to packed output lane p*Co+co (a 1x1 conv
    never mixes x phases)."""
    z = jnp.zeros_like(w)
    return jnp.block([[w, z], [z, w]])


def _pack2(b):
    """Bias row (1, C) -> packed (1, 2C) (both phases share the bias)."""
    return jnp.concatenate([b, b], axis=-1)


def _pack_w3(wb):
    """3x3 weight (3, 3, C, C) [dy, dx, ci, co] (dx: 0=left tap x-1,
    1=center, 2=right tap x+1) -> packed (3, 3, 2C, 2C) [dy, du] with
    du in {-1, 0, +1} packed-column offsets at index du+1:

      out[u, p_out*C+co] = sum_du inp[u+du] @ Wp[dy][du]

    Block (p_in, p_out) of Wp[dy][du] is the original tap Wb[dy, dx] with
    dx = (2*du + p_in - p_out) + 1 when that offset is a valid tap, else 0
    (input x = 2(u+du)+p_in, output x = 2u+p_out, tap = in_x - out_x)."""
    z = jnp.zeros_like(wb[0, 0])
    packed = []
    for dy in range(3):
        m = [[[z, z], [z, z]] for _ in range(3)]
        for du in (-1, 0, 1):
            for p_in in range(2):
                for p_out in range(2):
                    dx = 2 * du + p_in - p_out
                    if -1 <= dx <= 1:
                        m[du + 1][p_in][p_out] = wb[dy, dx + 1]
        packed.append(jnp.stack([jnp.block(m[i]) for i in range(3)]))
    return jnp.stack(packed)  # (3, 3, 2C, 2C)


def fold_res2_weights(stage_params, dtype):
    """Flatten the 3 bottleneck blocks' conv+affine params into the kernel's
    operand list (x-pair packed, see module docstring). Kernel order:

      [wa0, ba0, wb0, bb0, wcs0, bcs0,    # block 0 (branch1 merged into cs)
       wa1, ba1, wb1, bb1, wc1, bc1,      # block 1
       wa2, ba2, wb2, bb2, wc2, bc2]      # block 2

    wa: (2Cin, 128) block-diagonal 1x1 branch2a; wb: (3, 3, 128, 128)
    packed per-(dy, du) branch2b taps (_pack_w3); wc: (128, 512)
    block-diagonal branch2c; block 0's wcs0 (256, 512) K-stacks
    [branch2c(b0 phases); branch1(xt phases)] so both 1x1s run as one
    matmul. Biases are f32 (1, 2C) packed rows (added on the f32
    accumulator)."""
    ops = []
    for i, bp in enumerate(stage_params):
        wa, ba = fold_conv_affine(bp["branch2a"], bp["branch2a_bn"], dtype)
        wb, bb = fold_conv_affine(bp["branch2b"], bp["branch2b_bn"], dtype)
        wc, bc = fold_conv_affine(bp["branch2c"], bp["branch2c_bn"], dtype)
        ops += [_bd2(wa[0, 0]), _pack2(ba[None, :]),
                _pack_w3(wb), _pack2(bb[None, :])]
        if i == 0:
            ws, bs = fold_conv_affine(bp["branch1"], bp["branch1_bn"], dtype)
            # cat0 lanes are [b0 phase0|b0 phase1|xt phase0|xt phase1]:
            # rows of the stacked weight follow that order.
            wcp, wsp = _bd2(wc[0, 0]), _bd2(ws[0, 0])
            ops += [jnp.concatenate([wcp, wsp], axis=0),
                    _pack2((bc + bs)[None, :])]
        else:
            ops += [_bd2(wc[0, 0]), _pack2(bc[None, :])]
    return ops


def _conv1x1(x, w, b, relu=True):
    """x: (R, U, 2Cin) packed -> (R, U, w.shape[1]); f32 accumulate, cast
    to x.dtype. w is block-diagonal so phases stay separate."""
    R, U, Cin = x.shape
    y = jax.lax.dot_general(
        x.reshape(R * U, Cin), w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype).reshape(R, U, w.shape[1])


def _conv3x3(x, w3, b, relu=True):
    """SAME-x / VALID-y 3x3 conv on the packed layout: x (R, U, 128) ->
    (R-2, U, 128) via 9 accumulated (R*U, 128)@(128, 128) matmuls — one
    per (dy row-slice, du packed weight) — then the du = +-1 partial
    products are shifted one packed column on the f32 accumulator
    (pltpu.roll, natively 32-bit) with the wrapped edge column masked
    (conv SAME zero padding):

      out[u] = Q_m1[u-1] + Q_0[u] + Q_p1[u+1],  Q_du = x @ Wp[:, du]."""
    R, U, C = x.shape
    Ro = R - 2
    acc = [jnp.zeros((Ro * U, C), jnp.float32) for _ in range(3)]
    for dy in range(3):
        rows = x[dy:dy + Ro].reshape(Ro * U, C)
        for du in range(3):
            acc[du] = acc[du] + jax.lax.dot_general(
                rows, w3[dy, du], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    q_m1, q_0, q_p1 = (a.reshape(Ro, U, C) for a in acc)
    col = jax.lax.broadcasted_iota(jnp.int32, (Ro, U, 1), 1)
    y = (q_0 + b
         + jnp.where(col > 0, pltpu.roll(q_m1, 1, 1), 0.0)
         + jnp.where(col < U - 1, pltpu.roll(q_p1, U - 1, 1), 0.0))
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)


def _pack_x(x):
    """In-VMEM x-pair pack: (R, W, C) -> (R, W/2, 2C) with packed lanes
    [phase0 C | phase1 C] (phase = x parity). Pure vreg work — no HBM
    traffic (the whole point of packing inside the kernel, see
    _fused_res2's docstring).

    Mosaic cannot lower the naive formulations (probed on v5e, jax 0.9.0):
    the (R, W, C)->(R, W/2, 2C) reshape is an "unsupported shape cast",
    and strided loads / pltpu.roll are 32-bit-only. bf16 route: TPU stores
    bf16 sublane-PAIRS packed in one 32-bit slot, so pltpu.bitcast to
    uint32 yields (R, W/2, C) words whose LOW half is the even-x value
    (verified empirically) — mask/shift in 32-bit, widen both phases to
    f32 by placing bf16 bits in the top half, lane-concat, cast back.
    f32 route: pltpu.roll (32-bit legal) aligns the odd phase to sublane
    offset 0 so the lane-concat's operands agree on non-concat offsets."""
    R, W, C = x.shape
    U = W // 2
    if x.dtype == jnp.bfloat16:
        z = pltpu.bitcast(x, jnp.uint32)               # (R, U, C)
        a = jax.lax.bitcast_convert_type(z << 16, jnp.float32)
        b = jax.lax.bitcast_convert_type(
            z & jnp.uint32(0xFFFF0000), jnp.float32)
        return jnp.concatenate([a, b], axis=-1).astype(x.dtype)
    a = x.reshape(R, U, 2, C)[:, :, 0]
    b = pltpu.roll(x, W - 1, 1).reshape(R, U, 2, C)[:, :, 0]
    return jnp.concatenate([a, b], axis=-1)


def _unpack_x(y):
    """Inverse of _pack_x: (R, U, 2C) -> (R, 2U, C) (see _pack_x for why
    the formulations are dtype-specific)."""
    R, U, C2 = y.shape
    C = C2 // 2
    if y.dtype == jnp.bfloat16:
        b0 = jax.lax.bitcast_convert_type(
            y[:, :, :C].astype(jnp.float32), jnp.uint32)
        b1 = jax.lax.bitcast_convert_type(
            y[:, :, C:].astype(jnp.float32), jnp.uint32)
        return pltpu.bitcast((b0 >> 16) | (b1 & jnp.uint32(0xFFFF0000)),
                             jnp.bfloat16)             # (R, 2U, C)
    a = y[:, :, :C].reshape(R, U, 1, C)
    b = y[:, :, C:].reshape(R, U, 1, C)
    return jnp.concatenate([a, b], axis=2).reshape(R, 2 * U, C)


def _kernel(xp_ref, xc_ref, xn_ref,
            wa0, ba0, wb0, bb0, wcs0, bcs0,
            wa1, ba1, wb1, bb1, wc1, bc1,
            wa2, ba2, wb2, bb2, wc2, bc2,
            out_ref, *, ty, boundary):
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
    xt = jnp.concatenate([top, xc_ref[0], bot], axis=0)  # (ty+6, U, 128)
    if boundary == "kernel":
        xt = _pack_x(xt)  # blocks arrive unpacked (ty, W, 64)
    # boundary == "packed": blocks arrive pre-packed (the stem_pool_pack
    # producer already emitted the x-pair layout); output is unpacked.

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
    a0 = zero_edge_rows(_conv1x1(xt, wa0, ba0), 3)   # (ty+6, U, 128)
    b0 = _conv3x3(a0, wb0, bb0)                      # (ty+4, U, 128)
    cat0 = jnp.concatenate([b0, xt[1:ty + 5]], axis=-1)
    h0 = _conv1x1(cat0, wcs0, bcs0)                  # (ty+4, U, 512)

    # Block 1 (identity shortcut; add in activation dtype like XLA).
    a1 = zero_edge_rows(_conv1x1(h0, wa1, ba1), 2)
    b1 = _conv3x3(a1, wb1, bb1)                      # (ty+2, U, 128)
    c1 = _conv1x1(b1, wc1, bc1, relu=False)
    h1 = jnp.maximum(c1 + h0[1:ty + 3], 0.0)         # (ty+2, U, 512)

    # Block 2.
    a2 = zero_edge_rows(_conv1x1(h1, wa2, ba2), 1)
    b2 = _conv3x3(a2, wb2, bb2)                      # (ty, U, 128)
    c2 = _conv1x1(b2, wc2, bc2, relu=False)
    h2 = jnp.maximum(c2 + h1[1:ty + 1], 0.0)
    out_ref[0] = (_unpack_x(h2) if boundary in ("kernel", "packed")
                  else h2)


def fused_res2(x, weights, ty=8, interpret=None, boundary=None):
    """Resolve the test-only interpret override OUTSIDE the jit boundary
    (a global read inside the traced body would be baked into the cache).
    Default boundary: "kernel" for bf16 (the production dtype — its
    in-kernel pack is the probed-supported bitcast route) or any
    interpret run; "hbm" for f32 on real hardware (the f32 in-kernel pack
    uses pltpu.roll, untested on hardware — the jit-level reshape is the
    safe default there)."""
    if interpret is None:
        interpret = _FORCE_INTERPRET
    if boundary is None:
        boundary = ("kernel" if (x.dtype == jnp.bfloat16 or interpret)
                    else "hbm")
    return _fused_res2(x, tuple(weights), ty=ty, interpret=interpret,
                       boundary=boundary)


@functools.partial(jax.jit,
                   static_argnames=("ty", "interpret", "boundary"))
def _fused_res2(x, weights, ty, interpret, boundary):
    """x: (B, H, W, 64) post-stem-pool activations; weights: the
    fold_res2_weights list. Returns (B, H, W, 256) = res2 stage output.
    H must be a multiple of ty; W a multiple of 16 (so the packed width
    U = W/2 is sublane-legal). Forward-only: res2 is frozen in every
    reference config (RESNETS.FREEZE_AT >= 2) — the caller falls back to
    the XLA stage when gradients could flow (see models/resnet.py).

    boundary selects where the x-pair pack happens:
      - "kernel" (default): blocks stream in/out UNPACKED ((ty, W, 64) /
        (ty, W, 256)) and the pack/unpack is a VMEM vreg relayout inside
        the kernel. Measured necessary on v5e: the jit-level packing
        reshape is NOT the free bitcast the v2 design assumed — XLA
        materializes it as an HBM relayout copy (~12 ms/step at batch 64,
        'data formatting' in the trace; PERF.md round-5 fused-v2 table).
      - "hbm": the v2 behavior — jit-level reshape to (B, H, W/2, 128)
        outside the kernel, packed blocks in/out. Kept for A/B.
      - "packed": x is ALREADY the packed (B, H, U, 128) tensor (produced
        by stem_pool_pack — no boundary copy on either side); output is
        unpacked in-kernel like "kernel". The production v3 pipeline."""
    if boundary == "packed":
        B, H, U, Cin2 = x.shape
        Cin, W = Cin2 // 2, U * 2
    else:
        B, H, W, Cin = x.shape
        U = W // 2
    assert H % ty == 0 and W % 16 == 0, (x.shape, ty)
    nty = H // ty
    Cout = weights[4].shape[1]  # packed 2*256

    def xmap(off):
        def m(b, t):
            return (b, jnp.clip(t + off, 0, nty - 1), 0, 0)
        return m

    wspecs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weights]
    kern = functools.partial(_kernel, ty=ty, boundary=boundary)
    if boundary == "kernel":
        in_block, out_block = (1, ty, W, Cin), (1, ty, W, Cout // 2)
        out_shape = jax.ShapeDtypeStruct((B, H, W, Cout // 2), x.dtype)
        xin = x
    elif boundary == "packed":
        in_block, out_block = (1, ty, U, 2 * Cin), (1, ty, W, Cout // 2)
        out_shape = jax.ShapeDtypeStruct((B, H, W, Cout // 2), x.dtype)
        xin = x
    else:
        in_block, out_block = (1, ty, U, 2 * Cin), (1, ty, U, Cout)
        out_shape = jax.ShapeDtypeStruct((B, H, U, Cout), x.dtype)
        xin = x.reshape(B, H, U, 2 * Cin)
    out = pl.pallas_call(
        kern,
        grid=(B, nty),
        in_specs=[
            pl.BlockSpec(in_block, xmap(-1), memory_space=pltpu.VMEM),
            pl.BlockSpec(in_block, xmap(0), memory_space=pltpu.VMEM),
            pl.BlockSpec(in_block, xmap(+1), memory_space=pltpu.VMEM),
        ] + wspecs,
        out_specs=pl.BlockSpec(out_block, lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=out_shape,
        interpret=interpret,
    )(xin, xin, xin, *weights)
    if boundary in ("kernel", "packed"):
        return out
    return out.reshape(B, H, W, Cout // 2)


# ---------------------------------------------------------------------------
# Stem post-ops kernel: AffineChannel + ReLU + 3x3/2 max pool + x-pair pack
# ---------------------------------------------------------------------------

def _stem_pool_kernel(xp_ref, xc_ref, xn_ref, s_ref, b_ref, out_ref, *,
                      typ):
    """One output tile of affine+relu+maxpool(3x3, stride 2, SAME)+pack.

    Input blocks are (1, 2*typ, Wp, 64) raw stem-conv rows (halo: 1 row
    each side from the neighbor blocks). Output block: (1, typ, Wp/4, 128)
    x-pair-packed pooled activations. bf16 only — the x-direction pooling
    and packing ride the same uint32-bitcast-of-sublane-pairs route as
    _pack_x (Mosaic has no 16-bit strided/roll ops).

    Zero-padding is exact: activations are post-ReLU (>= 0) and every pool
    window contains at least one in-image pixel, so a max against zeroed
    out-of-image positions equals XLA's reduce-window(-inf init) result.
    Reference anchor: lib/modeling/ResNet.py :: basic_bn_stem (semantics).
    """
    t = pl.program_id(1)
    nty = pl.num_programs(1)
    top = xp_ref[0, 2 * typ - 1:2 * typ]
    bot = xn_ref[0, 0:1]
    xt = jnp.concatenate([top, xc_ref[0], bot], axis=0)
    R, Wp, C = xt.shape  # R = 2*typ + 2
    W, U = Wp // 2, Wp // 4

    # Affine + ReLU in f32 (folded-BN scale/bias), cast to bf16; zero the
    # out-of-image halo rows (edge tiles read clamped duplicate blocks).
    y = jnp.maximum(
        xt.astype(jnp.float32) * s_ref[...] + b_ref[...], 0.0)
    row = jax.lax.broadcasted_iota(jnp.int32, (R, 1, 1), 0)
    lo = jnp.where(t == 0, 1, 0)           # local row 0 is global row -1
    hi = R - jnp.where(t + 1 == nty, 1, 0)
    y = jnp.where((row >= lo) & (row < hi), y, 0.0).astype(jnp.bfloat16)

    # Pool-x (out col x covers input cols 2x-1, 2x, 2x+1): bitcast packs
    # input col pairs into one u32 (low half = even col, verified); the
    # 2x-1 term is the previous u32's high half, one 32-bit roll away.
    z = pltpu.bitcast(y, jnp.uint32)       # (R, W, C)
    hi_m = jnp.uint32(0xFFFF0000)
    a = jax.lax.bitcast_convert_type(z << 16, jnp.float32)       # col 2x
    c0 = jax.lax.bitcast_convert_type(z & hi_m, jnp.float32)     # col 2x+1
    cp = jax.lax.bitcast_convert_type(
        pltpu.roll(z, 1, 1) & hi_m, jnp.float32)                 # col 2x-1
    col = jax.lax.broadcasted_iota(jnp.int32, (R, W, 1), 1)
    cp = jnp.where(col > 0, cp, 0.0)
    px = jnp.maximum(jnp.maximum(a, c0), cp)    # (R, W, C) f32

    # Pool-y (out row y covers local input rows 2y, 2y+1, 2y+2).
    m = jnp.maximum(jnp.maximum(px[0:R - 2], px[1:R - 1]), px[2:R])
    pooled = m.reshape(typ, 2, W, C)[:, 0]      # (typ, W, C)

    # Pack x-pairs for the res2 kernel (f32 roll route — 32-bit legal).
    pa = pooled.reshape(typ, U, 2, C)[:, :, 0]
    pb = pltpu.roll(pooled, W - 1, 1).reshape(typ, U, 2, C)[:, :, 0]
    out_ref[0] = jnp.concatenate([pa, pb], axis=-1).astype(jnp.bfloat16)


def stem_pool_pack(x, s, b, typ=8, interpret=None):
    """AffineChannel + ReLU + 3x3 stride-2 SAME max pool + x-pair pack as
    one Pallas pass: x (B, Hp, Wp, 64) bf16 raw stem-conv output ->
    (B, Hp/2, Wp/4, 128) packed pooled activations, ready for
    fused_res2(boundary="packed").

    Why: with the res2 kernel consuming the pool output directly, XLA has
    no consumer to fuse the stem's affine/relu/pool into — they
    materialize as a 13.6 ms loop fusion + 13.4 ms reduce-window at batch
    64 (PERF.md round-5). This kernel replaces both with one DMA-bound
    pass (~2.9 GB moved ~= 3.5 ms at HBM rate)."""
    if interpret is None:
        interpret = _FORCE_INTERPRET
    return _stem_pool_pack(x, s, b, typ=typ, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("typ", "interpret"))
def _stem_pool_pack(x, s, b, typ, interpret):
    B, Hp, Wp, C = x.shape
    assert x.dtype == jnp.bfloat16, x.dtype
    assert Hp % (2 * typ) == 0 and Wp % 32 == 0, (x.shape, typ)
    H = Hp // 2
    nty = H // typ
    sf = s.astype(jnp.float32).reshape(1, 1, C)
    bf = b.astype(jnp.float32).reshape(1, 1, C)

    def xmap(off):
        def m(bi, t):
            return (bi, jnp.clip(t + off, 0, nty - 1), 0, 0)
        return m

    in_block = (1, 2 * typ, Wp, C)
    # Scoped-VMEM sizing: Mosaic's default 16 MB limit is 416 KB short at
    # batch-64 production geometry (typ=8, Wp=672: compile-time OOM on v5e).
    # Account the 3 double-buffered input blocks, the double-buffered output
    # block, and the kernel's f32 temporaries (y/z/a/c0/cp/px, each (R, Wp,
    # C)) explicitly, mirroring roi_align_kernel's slot accounting.
    R = 2 * typ + 2
    est = (3 * 2 * (2 * typ) * Wp * C * 2
           + 2 * typ * (Wp // 4) * 2 * C * 2
           + 6 * R * Wp * C * 4)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(min(100 * 2**20, est)))
    out = pl.pallas_call(
        functools.partial(_stem_pool_kernel, typ=typ),
        grid=(B, nty),
        in_specs=[
            pl.BlockSpec(in_block, xmap(-1), memory_space=pltpu.VMEM),
            pl.BlockSpec(in_block, xmap(0), memory_space=pltpu.VMEM),
            pl.BlockSpec(in_block, xmap(+1), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, typ, Wp // 4, 2 * C),
                               lambda bi, t: (bi, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, Wp // 4, 2 * C), x.dtype),
        interpret=interpret,
        **kwargs,
    )(x, x, x, sf, bf)
    return out
