"""Pallas TPU kernel for windowed multilevel RoIAlign (forward).

The XLA formulation (ops/windowed_roi.py) expresses the per-RoI window read
as a vmapped dynamic_slice — lowered to a block gather that the compiler
schedules conservatively. This kernel takes manual control of the data
movement: per grid step it issues async DMAs for a group of RoI windows
(HBM -> VMEM scratch) and runs the two interpolation contractions on-chip.

DOUBLE BUFFERING: grid steps on TPU run sequentially, so without overlap
each step would serialize (window DMAs) -> (interpolation matmuls). The
kernel keeps two window-scratch slots: during step i it first starts the
DMAs for step i+1 (origins come from a second, rolled copy of the starts
operand), then waits on and computes step i. Window DMA (~0.5 MB/RoI) and
MXU work overlap fully; measured ~2x on the Mask R-CNN box-head stage.
The layout (slot count, channel chunking, compute subgroups) is auto-sized
against the ~16 MB/core scoped-VMEM budget (_pick_layout): the box head
(pooled=7) gets 2 slots + one full-C/full-J matmul pair; the mask head
(pooled=14, 4x the f32 intermediates) splits the compute into subgroups
of J/2 RoIs to keep 2 slots rather than losing the DMA overlap.

Layout notes (per the TPU guide): window x offsets are 8-aligned by the
caller and hinted with pl.multiple_of so Mosaic can prove the (8, 128)
W/C tiling; channels ride the 128-lane axis; the per-step window origins
arrive as small blocked SMEM operands (a full-array scalar prefetch of
N x 3 origins would overflow SMEM at production RoI counts; the SMEM block
needs rois_per_step % 8 == 0 for the (8, 128) tiling rule). Channel chunks
are multiples of 128 so every in-kernel reshape splits the lane dim
legally.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = int(15.7 * 1024 * 1024)  # headroom under the 16 MB scope
# FIXUP sweeps (roi_window_pool_seg) may exceed the default 16 MB scope:
# they run a few dozen grid steps on a few percent of RoIs, so trading
# some of the core's remaining VMEM (v5e: 128 MB total) for full window
# width is strictly better than shrinking the window and routing the
# traffic to the far costlier gather fallback (the mask head's (32,96)
# rung shrank to (32,80) under the 16 MB scope, sending every wide
# detection through an 8.3 ms/step flat-pyramid gather — round-4 xprof).
# The elevated scope is requested per-kernel via
# CompilerParams(vmem_limit_bytes=...), touching nothing else in the
# program (the round-2 GLOBAL 32 MB experiment regressed the BASE sweep;
# this applies only to the small seg sweeps).
_VMEM_BUDGET_SEG = int(28 * 1024 * 1024)


def _vmem_estimate(slots, cc, sub, J, P, WY, WX, C, item):
    """Estimate of the kernel's scoped VMEM (bytes), calibrated against
    compiler-reported peaks: 18.10M for (2, C, 1) at P=14 (raw sum 20.0M,
    ratio 0.90), 16.93M for (2, 128, 1) at P=14 (raw 15.7M — the unrolled
    c-chunk loop keeps ~1.5x the single-iteration f32 intermediates
    alive, ratio 1.08). (2, C, 1) at P=7 (raw 15.7M) compiles. So: raw
    sum, with a 1.5x multiplier on the intermediates whenever the compute
    is unrolled (channel chunks or subgroups)."""
    scratch = slots * J * WY * WX * C * item
    out_blk = J * P * P * C * item
    Js = J // sub
    inter = 2 * Js * P * WX * cc * 4  # f32 t1 + its transposed copy
    if cc < C or sub > 1:
        # Unrolled chunk/subgroup loops additionally keep the f32 output
        # tile + its astype copy alive across iterations (compiler-measured:
        # P=14 (64, 48) at (1, 128, 2) peaks 16.68M where the t1-only
        # estimate said 15.4M — the 1.28M gap is exactly this term).
        inter += 2 * Js * P * P * cc * 4
        inter = int(1.5 * inter)
    return scratch + out_blk + inter


def _pick_layout(J, P, WY, WX, C, item, budget=_VMEM_BUDGET):
    """(n_slots, c_chunk, subgroups) fitting the VMEM budget; prefer DMA
    overlap (2 slots), then wide matmuls (full C, one subgroup). Chunks
    are lane multiples (128) so in-kernel reshapes stay legal."""
    override = os.environ.get("DETECTRON_TPU_ROI_LAYOUT")
    if override:
        sl, cc, sub = (int(x) for x in override.split(","))
        return sl, (C if cc == 0 else cc), sub
    chunks = [C] + ([128] if C % 128 == 0 and C > 128 else [])
    subs = [1] + ([2] if J % 2 == 0 else []) + ([4] if J % 4 == 0 else [])
    for slots in (2, 1):
        for sub in subs:
            for cc in chunks:
                if _vmem_estimate(slots, cc, sub, J, P, WY, WX, C, item) \
                        <= budget:
                    return slots, cc, sub
    return 1, chunks[-1], subs[-1]


def fit_window_x(J, P, WY, WX, C, item, budget=_VMEM_BUDGET):
    """Largest window_x <= WX (multiple of 8) for which some layout fits
    the given scoped-VMEM budget. Base sweeps fit the default 16 MB scope;
    FIXUP rungs fit _VMEM_BUDGET_SEG (roi_window_pool_seg raises its own
    scope), so shapes like (32, 96) at pooled=14/C=256 keep full width."""
    wx = WX
    while wx > 8:
        sl, cc, sub = _pick_layout(J, P, WY, wx, C, item, budget)
        if _vmem_estimate(sl, cc, sub, J, P, WY, wx, C, item) <= budget:
            return wx
        wx -= 8
    return wx


def fit_window_x_seg(J, P, WY, WX, C, item):
    """fit_window_x under the fixup sweeps' elevated VMEM scope."""
    return fit_window_x(J, P, WY, WX, C, item, budget=_VMEM_BUDGET_SEG)


def _kernel(starts_ref, starts_next_ref, vy_ref, vx_ref, canvas_ref,
            out_ref, win_scratch, sems, *, rois_per_step, window_y,
            window_x, pooled, channels, n_slots, c_chunk, subgroups,
            out_qp):
    step = pl.program_id(0)
    nsteps = pl.num_programs(0)
    slot = jax.lax.rem(step, n_slots)
    next_slot = jax.lax.rem(step + 1, n_slots)

    def dma(slot_i, sref, j):
        b = sref[j, 0]
        y0 = sref[j, 1]
        # x starts are pre-aligned by the caller; the hint lets Mosaic prove
        # the W-dim slice offset respects the (8, 128) tiling.
        x0 = pl.multiple_of(sref[j, 2], 8)
        return pltpu.make_async_copy(
            canvas_ref.at[b, pl.ds(y0, window_y), pl.ds(x0, window_x), :],
            win_scratch.at[slot_i, j],
            sems.at[slot_i, j],
        )

    if n_slots == 2:
        # Prologue: this step's own windows (first step only).
        @pl.when(step == 0)
        def _():
            for j in range(rois_per_step):
                dma(slot, starts_ref, j).start()

        # Overlap: start the NEXT step's DMAs before computing this one.
        @pl.when(step + 1 < nsteps)
        def _():
            for j in range(rois_per_step):
                dma(next_slot, starts_next_ref, j).start()
    else:
        for j in range(rois_per_step):
            dma(slot, starts_ref, j).start()

    # Per-RoI interpolation is two tiny matmuls (M = pooled = 7 -> ~5% MXU
    # row utilization). Batch a subgroup of Js RoIs into ONE pair of
    # matmuls via block-diagonal weight matrices: M grows to Js*P and the
    # stacked windows provide the K dimension. ~Js x redundant FLOPs (the
    # off-diagonal zeros) buy ~Js x better MXU occupancy — measured net
    # win on v5e.
    P, WY, WX, C = pooled, window_y, window_x, channels
    Js = rois_per_step // subgroups

    def block_diag(v2, W):
        # v2: (Js*P, W) per-RoI weights -> (Js*P, Js*W) block-diagonal
        r_grp = jax.lax.broadcasted_iota(jnp.int32, (Js * P, Js * W), 0) // P
        k_grp = jax.lax.broadcasted_iota(jnp.int32, (Js * P, Js * W), 1) // W
        return jnp.where(r_grp == k_grp, jnp.tile(v2, (1, Js)),
                         jnp.zeros((), v2.dtype))

    for s in range(subgroups):
        j0 = s * Js
        # Wait only this subgroup's windows: later subgroups' DMAs keep
        # landing while this one computes (intra-step overlap for the
        # single-slot configs).
        for j in range(j0, j0 + Js):
            dma(slot, starts_ref, j).wait()

        # vy/vx arrive pre-flattened to (N*P, W) — an in-kernel (J, P, W)
        # -> (J*P, W) reshape is an unsupported Mosaic shape cast (P=7 is
        # not a sublane multiple).
        bd_vy = block_diag(vy_ref[j0 * P:(j0 + Js) * P, :], WY)
        bd_vx = block_diag(vx_ref[j0 * P:(j0 + Js) * P, :], WX)

        for ci in range(C // c_chunk):
            cs = pl.ds(ci * c_chunk, c_chunk)
            cc = c_chunk
            wins = win_scratch[slot, j0:j0 + Js, :, :, cs].reshape(
                Js * WY, WX * cc)
            # t1[(j,p), (w,c)] = sum_h vy_j[p,h] win_j[h,w,c]. NB: Mosaic
            # requires f32 matmul accumulators (bf16 preferred_element_type
            # fails 'tpu.matmul op Expected matmul acc'), so t1 is f32.
            t1 = jax.lax.dot_general(
                bd_vy, wins, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(Js, P, WX, cc)
            t1 = t1.transpose(0, 2, 1, 3).reshape(Js * WX, P * cc)
            # out[(j,q), (p,c)] = sum_w vx_j[q,w] t1[(j,w), (p,c)]
            out = jax.lax.dot_general(
                bd_vx, t1, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(Js, P, P, cc)  # (j, q, p, c)
            if out_qp:
                # Caller absorbs the (q, p) order (e.g. the box-head FC
                # permutes its weight rows): skip the per-step VPU
                # transpose of the f32 result.
                out_ref[j0:j0 + Js, :, :, cs] = out.astype(out_ref.dtype)
            else:
                out_ref[j0:j0 + Js, :, :, cs] = out.transpose(
                    0, 2, 1, 3).astype(out_ref.dtype)


# ---------------------------------------------------------------------------
# Segmented variant: one sweep per window-shape rung of the RoI ladder
# ---------------------------------------------------------------------------

def _kernel_seg(seg_ref, starts_ref, starts_next_ref, vy_ref, vx_ref,
                canvas_ref, out_ref, win_scratch, sems, *,
                rois_per_step, window_y, window_x, pooled, channels,
                n_slots, c_chunk, subgroups, out_qp):
    """_kernel with a dynamic active step range [seg[0], seg[1]).

    The grid is a static CAPACITY; only the first seg[1] steps (the
    runtime count of RoIs to pool, in J-row blocks) do anything — inactive
    steps issue no DMAs and map their output to a dummy tail block (see
    roi_window_pool_seg), so they cost only the grid-loop bookkeeping."""
    step = pl.program_id(0)
    lo = seg_ref[0]
    hi = seg_ref[1]
    active = jnp.logical_and(step >= lo, step < hi)
    slot = jax.lax.rem(step, n_slots)
    next_slot = jax.lax.rem(step + 1, n_slots)

    def dma(slot_i, sref, j):
        b = sref[j, 0]
        y0 = sref[j, 1]
        x0 = pl.multiple_of(sref[j, 2], 8)
        return pltpu.make_async_copy(
            canvas_ref.at[b, pl.ds(y0, window_y), pl.ds(x0, window_x), :],
            win_scratch.at[slot_i, j],
            sems.at[slot_i, j],
        )

    if n_slots == 2:
        # NB: every started DMA must be awaited before the kernel exits;
        # the prologue must not fire for an EMPTY segment (lo == hi, a
        # rung no RoI mapped to) — `active` already implies lo < hi.
        @pl.when(jnp.logical_and(step == lo, active))
        def _():
            for j in range(rois_per_step):
                dma(slot, starts_ref, j).start()

        @pl.when(jnp.logical_and(active, step + 1 < hi))
        def _():
            for j in range(rois_per_step):
                dma(next_slot, starts_next_ref, j).start()
    else:
        @pl.when(active)
        def _():
            for j in range(rois_per_step):
                dma(slot, starts_ref, j).start()

    P, WY, WX, C = pooled, window_y, window_x, channels
    Js = rois_per_step // subgroups

    def block_diag(v2, W):
        r_grp = jax.lax.broadcasted_iota(jnp.int32, (Js * P, Js * W), 0) // P
        k_grp = jax.lax.broadcasted_iota(jnp.int32, (Js * P, Js * W), 1) // W
        return jnp.where(r_grp == k_grp, jnp.tile(v2, (1, Js)),
                         jnp.zeros((), v2.dtype))

    @pl.when(active)
    def _():
        for s in range(subgroups):
            j0 = s * Js
            for j in range(j0, j0 + Js):
                dma(slot, starts_ref, j).wait()

            bd_vy = block_diag(vy_ref[j0 * P:(j0 + Js) * P, :], WY)
            bd_vx = block_diag(vx_ref[j0 * P:(j0 + Js) * P, :], WX)

            for ci in range(C // c_chunk):
                cs = pl.ds(ci * c_chunk, c_chunk)
                cc = c_chunk
                wins = win_scratch[slot, j0:j0 + Js, :, :, cs].reshape(
                    Js * WY, WX * cc)
                t1 = jax.lax.dot_general(
                    bd_vy, wins, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).reshape(Js, P, WX, cc)
                t1 = t1.transpose(0, 2, 1, 3).reshape(Js * WX, P * cc)
                out = jax.lax.dot_general(
                    bd_vx, t1, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).reshape(Js, P, P, cc)
                if out_qp:
                    out_ref[j0:j0 + Js, :, :, cs] = out.astype(out_ref.dtype)
                else:
                    out_ref[j0:j0 + Js, :, :, cs] = out.transpose(
                        0, 2, 1, 3).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("window_y", "window_x", "pooled", "rois_per_step",
                     "interpret", "out_qp"),
)
def roi_window_pool_seg(canvas, seg, starts, vy, vx, window_y,
                        window_x, pooled, rois_per_step=8, interpret=False,
                        out_qp=False):
    """Bounded-count sweep: like roi_window_pool over a CAPACITY of N RoI
    rows, but only grid steps in [seg[0], seg[1]) (normally [0, ceil(
    count/J)) for a runtime count <= N) compute; the rest cost only the
    grid-loop bookkeeping (no DMA — their output maps to a dummy tail
    block and their input block indices clamp to the segment edge, which
    skips the copy). Used for the RoI-ladder FIXUP sweeps: a small
    compacted array of elongated RoIs pooled at a taller/wider window
    shape than the main sweep's. Returns (N + J, P, P, C); rows beyond
    seg[1]*J are garbage — callers gather/scatter only the counted rows."""
    N = starts.shape[0]
    C = canvas.shape[-1]
    J = rois_per_step
    assert N % J == 0
    nsteps = N // J
    grid = (nsteps,)

    item = canvas.dtype.itemsize
    n_slots, c_chunk, subgroups = _pick_layout(
        J, pooled, window_y, window_x, C, item)
    compiler_params = None
    if _vmem_estimate(n_slots, c_chunk, subgroups, J, pooled, window_y,
                      window_x, C, item) > _VMEM_BUDGET:
        # Window too wide for the default 16 MB scope: re-pick under the
        # elevated fixup budget and raise THIS kernel's scoped-VMEM limit
        # (see _VMEM_BUDGET_SEG). The estimate is calibrated to ~±10% of
        # the compiler's measured peak; the 1.25x margin covers it.
        n_slots, c_chunk, subgroups = _pick_layout(
            J, pooled, window_y, window_x, C, item,
            budget=_VMEM_BUDGET_SEG)
        est = _vmem_estimate(n_slots, c_chunk, subgroups, J, pooled,
                             window_y, window_x, C, item)
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=int(est * 1.25))

    starts_next = jnp.roll(starts, -J, axis=0)

    kernel = functools.partial(
        _kernel_seg, rois_per_step=J, window_y=window_y,
        window_x=window_x, pooled=pooled, channels=C, n_slots=n_slots,
        c_chunk=c_chunk, subgroups=subgroups, out_qp=out_qp)

    def clampmap(i, seg_ref):
        # Inactive steps re-load the segment's edge block (consecutive
        # equal indices skip the copy) instead of streaming unused blocks.
        return jnp.clip(i, seg_ref[0],
                        jnp.maximum(seg_ref[1] - 1, seg_ref[0]))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((J, 3), lambda i, s: (clampmap(i, s), 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((J, 3), lambda i, s: (clampmap(i, s), 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((J * pooled, window_y),
                         lambda i, s: (clampmap(i, s), 0)),
            pl.BlockSpec((J * pooled, window_x),
                         lambda i, s: (clampmap(i, s), 0)),
            pl.BlockSpec(memory_space=pl.ANY),   # canvas stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (J, pooled, pooled, C),
            lambda i, s: (jnp.where(
                jnp.logical_and(i >= s[0], i < s[1]), i, nsteps), 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((n_slots, J, window_y, window_x, C), canvas.dtype),
            pltpu.SemaphoreType.DMA((n_slots, J)),
        ],
    )

    kwargs = {}
    if compiler_params is not None and not interpret:
        kwargs["compiler_params"] = compiler_params
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (N + J, pooled, pooled, C), canvas.dtype),
        interpret=interpret,
        **kwargs,
    )(seg, starts, starts_next, vy.reshape(N * pooled, window_y),
      vx.reshape(N * pooled, window_x), canvas)


# ---------------------------------------------------------------------------
# BACKWARD: windowed RoIAlign transpose as a window-accumulate kernel
# ---------------------------------------------------------------------------

def _kernel_accum_seg(seg_ref, starts_ref, ctq_ref, vyt_ref, vxt_ref,
                      canvas_in_ref, canvas_ref, win_scratch, sem, *,
                      rois_per_step, window_y, window_x, pooled, channels):
    """Transpose of _kernel_seg's linear map: for each RoI, accumulate
    d_win[h, w, c] = sum_p vy[p, h] * sum_q vx[q, w] * ct[p, q, c] into its
    canvas window (read-modify-write). TPU grid steps run SEQUENTIALLY and
    the j-loop below waits each window's write-back before starting the
    next window's read, so overlapping windows (RoIs cluster on P2)
    accumulate correctly — this is what makes the kernel a legal scatter-
    add. The per-RoI matmuls are tiny (K = pooled = 7) but the kernel is
    DMA-bound by construction; the window gradient is computed WHILE the
    read DMA is in flight.

    Replaces the XLA lowering of the gather/window transpose, which
    emitted per-sample scatter-adds at 0.7-27 GB/s — 44% of the Mask R-CNN
    train step at batch 8 (round-4 xprof, PERF.md)."""
    del canvas_in_ref  # aliased with canvas_ref (the RMW target)
    step = pl.program_id(0)
    lo = seg_ref[0]
    hi = seg_ref[1]
    active = jnp.logical_and(step >= lo, step < hi)
    P, WY, WX, C = pooled, window_y, window_x, channels

    @pl.when(active)
    def _():
        for j in range(rois_per_step):
            b = starts_ref[j, 0]
            y0 = starts_ref[j, 1]
            x0 = pl.multiple_of(starts_ref[j, 2], 8)
            win = canvas_ref.at[b, pl.ds(y0, window_y),
                                pl.ds(x0, window_x), :]
            rd = pltpu.make_async_copy(win, win_scratch, sem)
            rd.start()
            # Window gradient while the read flies. u2[(w), (p, c)] =
            # sum_q vx[q, w] ct[q, (p, c)]; dw[(h), (w, c)] =
            # sum_p vy[p, h] u2'[(p), (w, c)]. All reshapes split/merge
            # LANES only (P/Q = 7 never merges into sublanes — an
            # unsupported Mosaic shape cast, same constraint as the
            # forward kernel's pre-flattened vy/vx).
            u2 = jax.lax.dot_general(
                vxt_ref[j], ctq_ref[j], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (WX, P*C)
            m = u2.reshape(WX, P, C).transpose(1, 0, 2).reshape(P, WX * C)
            dw = jax.lax.dot_general(
                vyt_ref[j], m, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (WY, WX*C)
            rd.wait()
            win_scratch[:] = win_scratch[:] + dw.reshape(
                WY, WX, C).astype(win_scratch.dtype)
            wr = pltpu.make_async_copy(win_scratch, win, sem)
            wr.start()
            # Serialize: window j+1 may overlap window j; its read must
            # observe this write.
            wr.wait()


@functools.partial(
    jax.jit,
    static_argnames=("window_y", "window_x", "pooled", "rois_per_step",
                     "interpret"),
    donate_argnums=(0,),
)
def roi_window_accum_seg(canvas_grad, seg, starts, ct, vy, vx, window_y,
                         window_x, pooled, rois_per_step=8,
                         interpret=False):
    """Accumulate per-RoI pooled cotangents back into a gradient canvas:
    the exact linear transpose of roi_window_pool(_seg) for the same
    (starts, vy, vx). canvas_grad: (B, Hc, Wc, C) float32 (donated,
    updated in place via input/output aliasing); seg: (2,) int32 active
    step range (pass [0, N // J] for a full sweep); starts: (N, 3) int32
    [img, y0, x0] with x0 8-aligned; ct: (N, P, P, C) cotangent rows in
    (p, q) order — callers with out_qp forwards swap axes first; vy:
    (N, P, WY), vx: (N, P, WX) — the SAME interpolation weights as the
    forward. Rows whose cotangent is zero accumulate zeros (callers mask
    rather than compact when most rows are active). Returns the updated
    canvas."""
    N = starts.shape[0]
    C = canvas_grad.shape[-1]
    J = rois_per_step
    assert N % J == 0
    assert canvas_grad.dtype == jnp.float32
    nsteps = N // J
    P = pooled

    # Host-side layouts the kernel can consume without sublane merges:
    # ctq (N, Q, P*C) rows-by-q; vyT (N, WY, P); vxT (N, WX, Q).
    ctq = ct.astype(jnp.float32).transpose(0, 2, 1, 3).reshape(N, P, P * C)
    vyt = jnp.swapaxes(vy.astype(jnp.float32), 1, 2)
    vxt = jnp.swapaxes(vx.astype(jnp.float32), 1, 2)

    kernel = functools.partial(
        _kernel_accum_seg, rois_per_step=J, window_y=window_y,
        window_x=window_x, pooled=pooled, channels=C)

    def clampmap(i, seg_ref):
        return jnp.clip(i, seg_ref[0],
                        jnp.maximum(seg_ref[1] - 1, seg_ref[0]))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((J, 3), lambda i, s: (clampmap(i, s), 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((J, P, P * C), lambda i, s: (clampmap(i, s), 0, 0)),
            pl.BlockSpec((J, window_y, P),
                         lambda i, s: (clampmap(i, s), 0, 0)),
            pl.BlockSpec((J, window_x, P),
                         lambda i, s: (clampmap(i, s), 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),   # canvas stays in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((window_y, window_x, C), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    # VMEM: one RMW window + the f32 dw/u2 intermediates + the weight/ct
    # blocks. The tall/wide rung shapes at P=14 exceed the default 16 MB
    # scope the same way the forward seg sweeps do; raise this kernel's
    # scope when the estimate says so.
    est = (2 * window_y * window_x * C * 4          # scratch + dw
           + window_x * P * C * 4 * 2               # u2 + its transpose
           # in_specs blocks are double-buffered by the Pallas pipeline:
           # count ctq/vyt/vxt twice or est can undercount for tall/wide
           # rungs at pooled=14 (compile-time VMEM failure).
           + 2 * J * (P * P * C + (window_y + window_x) * P) * 4)
    kwargs = {}
    if est > _VMEM_BUDGET and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(est * 1.25))

    # Operand indices for aliasing count the scalar-prefetch arg: seg=0,
    # starts=1, ctq=2, vyt=3, vxt=4, canvas=5.
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(canvas_grad.shape, jnp.float32),
        input_output_aliases={5: 0},
        interpret=interpret,
        **kwargs,
    )(seg, starts, ctq, vyt, vxt, canvas_grad)


@functools.partial(
    jax.jit,
    static_argnames=("window_y", "window_x", "pooled", "rois_per_step",
                     "interpret", "out_qp"),
)
def roi_window_pool(canvas, starts, vy, vx, window_y, window_x, pooled,
                    rois_per_step=8, interpret=False, out_qp=False):
    """canvas: (B, Hc, Wc, C); starts: (N, 3) int32 [img, y0, x0] with x0
    8-aligned; vy: (N, P, WY), vx: (N, P, WX) interpolation weights (grid
    average folded in). Returns (N, P, P, C). N must be a multiple of
    rois_per_step."""
    N = starts.shape[0]
    C = canvas.shape[-1]
    assert N % rois_per_step == 0
    grid = (N // rois_per_step,)

    item = canvas.dtype.itemsize
    n_slots, c_chunk, subgroups = _pick_layout(
        rois_per_step, pooled, window_y, window_x, C, item)
    compiler_params = None
    if n_slots < 2:
        # Default-scope pick lost the double buffering (e.g. the mask
        # head's P=14 f32 intermediates push the 2-slot layout to ~16-19
        # MB): re-pick under the elevated budget and raise THIS kernel's
        # scoped-VMEM limit, exactly like the fixup seg sweeps. Measured
        # round 4: the single-slot mask base sweep ran at ~2x its DMA
        # floor (10.2 ms/step at batch 48) for want of ~3 MB of scope.
        sl2, cc2, sub2 = _pick_layout(
            rois_per_step, pooled, window_y, window_x, C, item,
            budget=_VMEM_BUDGET_SEG)
        if sl2 > n_slots:
            n_slots, c_chunk, subgroups = sl2, cc2, sub2
            est = _vmem_estimate(n_slots, c_chunk, subgroups, rois_per_step,
                                 pooled, window_y, window_x, C, item)
            compiler_params = pltpu.CompilerParams(
                vmem_limit_bytes=int(est * 1.25))

    # Step i's block of this rolled copy holds step i+1's origins (the
    # double-buffer prefetch source). The wrap-around block is never started
    # (guarded by step+1 < nsteps).
    starts_next = jnp.roll(starts, -rois_per_step, axis=0)

    kernel = functools.partial(
        _kernel, rois_per_step=rois_per_step, window_y=window_y,
        window_x=window_x, pooled=pooled, channels=C, n_slots=n_slots,
        c_chunk=c_chunk, subgroups=subgroups, out_qp=out_qp)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (rois_per_step, 3),
                lambda i: (i, 0),
                memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (rois_per_step, 3),
                lambda i: (i, 0),
                memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (rois_per_step * pooled, window_y),
                lambda i: (i, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (rois_per_step * pooled, window_x),
                lambda i: (i, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # canvas stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (rois_per_step, pooled, pooled, C),
            lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n_slots, rois_per_step, window_y, window_x, C),
                       canvas.dtype),
            pltpu.SemaphoreType.DMA((n_slots, rois_per_step)),
        ],
        out_shape=jax.ShapeDtypeStruct((N, pooled, pooled, C), canvas.dtype),
        interpret=interpret,
        **({"compiler_params": compiler_params}
           if compiler_params is not None and not interpret else {}),
    )(starts, starts_next, vy.reshape(N * pooled, window_y),
      vx.reshape(N * pooled, window_x), canvas)
