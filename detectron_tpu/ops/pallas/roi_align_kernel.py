"""Pallas TPU kernel for windowed multilevel RoIAlign (forward).

The XLA formulation (ops/windowed_roi.py) expresses the per-RoI window read
as a vmapped dynamic_slice — lowered to a block gather that the compiler
schedules conservatively. This kernel takes manual control of the data
movement: per grid step it issues async DMAs for a group of RoI windows
(HBM -> VMEM scratch), overlaps them, and runs the two interpolation
contractions on-chip. Numerics are identical to windowed_roi (same
precomputed interpolation weight matrices).

Layout notes (per the TPU guide): window x offsets are 8-aligned by the
caller and hinted with pl.multiple_of so Mosaic can prove the (8, 128)
W/C tiling; channels ride the 128-lane axis; the per-step window origins
arrive as a small blocked SMEM operand (a full-array scalar prefetch of
N x 3 origins would overflow the ~1 MB SMEM at production RoI counts).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(starts_ref, vy_ref, vx_ref, canvas_ref, out_ref, win_scratch,
            sems, *, rois_per_step, window_y, window_x, pooled, channels):
    def dma(j):
        b = starts_ref[j, 0]
        y0 = starts_ref[j, 1]
        # x starts are pre-aligned by the caller; the hint lets Mosaic prove
        # the W-dim slice offset respects the (8, 128) tiling.
        x0 = pl.multiple_of(starts_ref[j, 2], 8)
        return pltpu.make_async_copy(
            canvas_ref.at[b, pl.ds(y0, window_y), pl.ds(x0, window_x), :],
            win_scratch.at[j],
            sems.at[j],
        )

    for j in range(rois_per_step):
        dma(j).start()

    for j in range(rois_per_step):
        dma(j).wait()
        win = win_scratch[j]  # (WY, WX, C)
        vy = vy_ref[j]  # (P, WY)
        vx = vx_ref[j]  # (P, WX)
        # tmp[p, w, c] = sum_h vy[p, h] win[h, w, c]
        tmp = jax.lax.dot_general(
            vy, win.reshape(window_y, window_x * channels),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(pooled, window_x, channels)
        # out[q, p, c] = sum_w vx[q, w] tmp[p, w, c]
        out_qpc = jax.lax.dot_general(
            vx, tmp.transpose(1, 0, 2).reshape(window_x, pooled * channels),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(pooled, pooled, channels)
        out_ref[j] = out_qpc.transpose(1, 0, 2).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("window_y", "window_x", "pooled", "rois_per_step",
                     "interpret"),
)
def roi_window_pool(canvas, starts, vy, vx, window_y, window_x, pooled,
                    rois_per_step=8, interpret=False):
    """canvas: (B, Hc, Wc, C); starts: (N, 3) int32 [img, y0, x0] with x0
    8-aligned; vy: (N, P, WY), vx: (N, P, WX) interpolation weights (grid
    average folded in). Returns (N, P, P, C). N must be a multiple of
    rois_per_step."""
    N = starts.shape[0]
    C = canvas.shape[-1]
    assert N % rois_per_step == 0
    grid = (N // rois_per_step,)

    kernel = functools.partial(
        _kernel, rois_per_step=rois_per_step, window_y=window_y,
        window_x=window_x, pooled=pooled, channels=C)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (rois_per_step, 3),
                lambda i: (i, 0),
                memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (rois_per_step, pooled, window_y),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (rois_per_step, pooled, window_x),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # canvas stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (rois_per_step, pooled, pooled, C),
            lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rois_per_step, window_y, window_x, C),
                       canvas.dtype),
            pltpu.SemaphoreType.DMA((rois_per_step,)),
        ],
        out_shape=jax.ShapeDtypeStruct((N, pooled, pooled, C), canvas.dtype),
        interpret=interpret,
    )(starts, vy, vx, canvas)
