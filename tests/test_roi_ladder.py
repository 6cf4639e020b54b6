"""Window-rung-ladder Pallas RoIAlign (ops/windowed_roi.py ::
multilevel_roi_align_pallas_ladder) vs the exact gather reference: the
ladder must be EXACT for every practically-shaped RoI, including the
elongated mid-level RoIs the single-window path used to clamp (reference:
lib/modeling/roi_xfrom/roi_align is exact for all RoIs). Runs the kernels
in interpret mode on CPU (the conftest pins the CPU backend); the TPU
aliasing merge is exercised on hardware by bench/tools runs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detectron_tpu.ops import multilevel_roi as ml
from detectron_tpu.ops import windowed_roi as win

SCALES = (0.125, 0.0625, 0.03125, 0.015625)


def _pyramid(rng, B, C=8):
    return [jnp.asarray(rng.randn(B, h, w, C).astype(np.float32))
            for h, w in ((104, 168), (52, 84), (26, 42), (13, 21))]


def _build(s, aspect, x=30.0, y=20.0):
    w = s * np.sqrt(aspect)
    h = s / np.sqrt(aspect)
    return [x, y, x + w, y + h]


def _ref(pyr, rois):
    B = rois.shape[0]
    return np.stack([np.asarray(ml.multilevel_roi_align(
        [f[b] for f in pyr], SCALES, rois[b], 7, 2, 2, 5,
        canonical_scale=224, canonical_level=4, chunk=8))
        for b in range(B)])


def _ladder(pyr, rois, **kw):
    return win.multilevel_roi_align_pallas_ladder(
        pyr, SCALES, rois, 7, 2, 2, 5, canonical_scale=224,
        canonical_level=4, interpret=True, **kw)


def test_ladder_exact_all_shapes():
    """Moderate + elongated (aspect up to 8) + big top-level RoIs across
    two images with different rung mixes: all exact."""
    rng = np.random.RandomState(3)
    B = 2
    pyr = _pyramid(rng, B)
    rois_np = np.array([
        [_build(s, a) for s in (120.0, 300.0, 440.0)
         for a in (1.0, 0.5, 2.0)]
        + [_build(400.0, 4.0), _build(400.0, 0.25), _build(900.0, 1.0),
           _build(360.0, 8.0), _build(300.0, 3.0),
           _build(250.0, 1.0, 200, 300), _build(90.0, 1.0)]
        for _ in range(B)], np.float32)
    rois_np[1] = rois_np[1][::-1].copy()  # different slot layout per image
    rois = jnp.asarray(rois_np)

    out = np.asarray(_ladder(pyr, rois))
    np.testing.assert_allclose(out, _ref(pyr, rois), rtol=1e-4, atol=2e-4)


def test_ladder_fixup_capacity_overflow_exact_fallback():
    """More elongated RoIs than the small fixup capacity (16 RoIs with
    fix_frac=16 -> cap 8): the overflow cond re-runs the sweeps at full
    capacity, so EVERY RoI is still exact (mirrors the NMS pre-top-K
    overflow escape)."""
    rng = np.random.RandomState(4)
    B = 1
    pyr = _pyramid(rng, B)
    rois = jnp.asarray(np.array([
        [_build(400.0, 0.1, 30.0 + 5 * i, 10.0) for i in range(12)]
        + [_build(150.0, 1.0), _build(900.0, 1.0),
           _build(120.0, 1.0), _build(90.0, 1.0)]], np.float32))
    out = np.asarray(_ladder(pyr, rois, fix_frac=16))
    ref = _ref(pyr, rois)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=2e-4)


def test_ladder_out_qp_transposed():
    rng = np.random.RandomState(5)
    B = 1
    pyr = _pyramid(rng, B)
    rois = jnp.asarray(np.array([
        [_build(150.0, 1.0), _build(400.0, 4.0), _build(900.0, 1.0),
         _build(200.0, 0.33)]], np.float32))
    out = np.asarray(_ladder(pyr, rois))
    out_qp = np.asarray(_ladder(pyr, rois, out_qp=True))
    np.testing.assert_array_equal(out_qp.swapaxes(2, 3), out)


def test_ladder_single_rung_degenerate():
    """All RoIs in one rung (uniform moderate sizes): the other rungs'
    sweeps are fully inactive — output must still be exact."""
    rng = np.random.RandomState(6)
    B = 1
    pyr = _pyramid(rng, B)
    rois = jnp.asarray(np.array([
        [_build(s, 1.0, 10.0 * i, 5.0 * i) for i, s in
         enumerate((120.0, 130.0, 140.0, 150.0, 160.0, 170.0, 180.0,
                    190.0))]], np.float32))
    out = np.asarray(_ladder(pyr, rois))
    np.testing.assert_allclose(out, _ref(pyr, rois), rtol=1e-4, atol=2e-4)


def test_ladder_trainable_grad_matches_gather_autodiff():
    """The ladder custom_vjp backward (linear transpose of the exact gather
    map) must match autodiff through the gather path, for a mix of rungs
    including top-level RoIs."""
    rng = np.random.RandomState(8)
    B = 2
    pyr = _pyramid(rng, B, C=4)
    rois = jnp.asarray(np.array([
        [_build(150.0, 1.0), _build(400.0, 4.0), _build(900.0, 1.0),
         _build(200.0, 0.33)]] * B, np.float32))

    def loss_ladder(pyr):
        out = win.multilevel_roi_align_ladder_trainable(
            pyr, SCALES, rois, 7, 2, 2, 5, 224, 4,
            ((32, 40), (64, 48), (32, 96)), 8, True)
        return jnp.sum(out.astype(jnp.float32) ** 2 * 0.5)

    def loss_gather(pyr):
        out = jax.vmap(lambda fs, r: ml.multilevel_roi_align(
            fs, SCALES, r, 7, 2, 2, 5, canonical_scale=224,
            canonical_level=4, chunk=8))(pyr, rois)
        return jnp.sum(out.astype(jnp.float32) ** 2 * 0.5)

    g1 = jax.grad(loss_ladder)(list(pyr))
    g2 = jax.grad(loss_gather)(list(pyr))
    # Same primal (ladder is exact here) -> same cotangent into the same
    # linear map: gradients agree to float tolerance.
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_ladder_model_level_matches_gather_impl():
    """roi_feature_transform with TPU.ROI_LADDER (default) must match the
    gather impl at the model-builder surface (FPN Mask R-CNN shapes)."""
    from detectron_tpu.core.config import cfg
    from detectron_tpu.models import model_builder as mb

    rng = np.random.RandomState(9)
    B = 2
    pyr = _pyramid(rng, B)
    rois = jnp.asarray(np.array([
        [_build(s, a) for s in (120.0, 300.0, 900.0, 400.0)
         for a in (1.0, 4.0)]] * B, np.float32))
    assert cfg.TPU.ROI_LADDER
    out_l = mb.roi_feature_transform(
        {}, list(pyr), SCALES, rois, 7, 2, method="RoIAlign",
        impl="pallas")
    out_g = mb.roi_feature_transform(
        {}, list(pyr), SCALES, rois, 7, 2, method="RoIAlign",
        impl="gather")
    np.testing.assert_allclose(np.asarray(out_l), np.asarray(out_g),
                               rtol=1e-4, atol=2e-4)


def test_ladder_beyond_ladder_sliver_exact():
    """Slivers beyond every rung's coverage (aspect ~37 at band-top) route
    through the compacted exact-gather fixup: the WHOLE batch — slivers
    included — matches the exact gather reference (the reference CUDA
    kernel is exact for all shapes)."""
    rng = np.random.RandomState(7)
    B = 2
    pyr = _pyramid(rng, B)
    rois = jnp.asarray(np.array([
        [_build(150.0, 1.0), [5.0, 300.0, 1300.0, 330.0],
         _build(400.0, 1.0), _build(200.0, 2.0)]] * B, np.float32))
    out = np.asarray(_ladder(pyr, rois))
    ref = _ref(pyr, rois)
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=2e-4)


def _pyramid_prod(rng, B, C=8):
    """Production 832x1344-canvas FPN geometry (W_top=42 > the narrow base
    window 40, so narrow_base actually changes the base geometry)."""
    return [jnp.asarray(rng.randn(B, h, w, C).astype(np.float32))
            for h, w in ((208, 336), (104, 168), (52, 84), (26, 42))]


def test_ladder_narrow_base_exact():
    """narrow_base=True (base stays (32, 40); top-level RoIs route through
    the auto-appended whole-top-level rung): exact for the same RoI mix as
    the widened-base default, and identical to it."""
    rng = np.random.RandomState(12)
    B = 2
    pyr = _pyramid_prod(rng, B)
    rois = jnp.asarray(np.array([
        [_build(150.0, 1.0), _build(900.0, 1.0), _build(1200.0, 2.0),
         _build(400.0, 4.0), _build(300.0, 0.33), _build(700.0, 1.0),
         _build(120.0, 1.0, 500.0, 400.0), _build(200.0, 2.0)]] * B,
        np.float32))
    ref = _ref(pyr, rois)
    out_n = np.asarray(_ladder(pyr, rois, narrow_base=True))
    np.testing.assert_allclose(out_n, ref, rtol=1e-4, atol=2e-4)
    out_w = np.asarray(_ladder(pyr, rois))
    np.testing.assert_allclose(out_n, out_w, rtol=1e-4, atol=2e-4)


def test_ladder_narrow_top_rung_overflow():
    """More top-level RoIs than the top rung's n/top_frac capacity: the
    per-rung overflow cond re-runs at full capacity — still exact."""
    rng = np.random.RandomState(13)
    B = 1
    pyr = _pyramid_prod(rng, B)
    # 12 of 16 RoIs are top-level (s >= 448 maps to level 5); top_frac=4
    # gives cap max(16 // 4, 8) = 8 < 12 -> overflow escape.
    rois = jnp.asarray(np.array([
        [_build(600.0 + 20.0 * i, 1.0, 10.0 * i, 5.0 * i)
         for i in range(12)]
        + [_build(150.0, 1.0), _build(300.0, 1.0), _build(400.0, 4.0),
           _build(120.0, 1.0)]], np.float32))
    out = np.asarray(_ladder(pyr, rois, narrow_base=True, top_frac=4))
    np.testing.assert_allclose(out, _ref(pyr, rois), rtol=1e-4, atol=2e-4)


def test_ladder_mid_tier_escalation_exact():
    """Multi-chunk rung counts (advisor r3 medium asked for n>=72
    coverage): with n=80 RoIs (J=8, default fix_frac=8 -> per-rung chunk
    cap 16), 12 RoIs routed to a rung need TWO while-loop chunks — the
    second partially filled. 12 wide-elongated RoIs exercise the (32,96)
    rung's multi-chunk path, 12 tall-elongated the (64,48) rung's, and
    all 80 RoIs must match the exact gather reference. (Historically this
    guarded the n/8 capacity-tier cond dispatch the while-loop chunking
    replaced — the count regime is preserved.)"""
    rng = np.random.RandomState(21)
    B = 1
    pyr = _pyramid(rng, B)
    wide = [_build(360.0, 8.0, 10.0 + 7.0 * i, 12.0 + 11.0 * i)
            for i in range(12)]
    tall = [_build(400.0, 0.1, 30.0 + 9.0 * i, 5.0 + 3.0 * i)
            for i in range(12)]
    normal = [_build(80.0 + 4.0 * i, 1.0, 5.0 + 3.0 * i, 8.0 + 2.0 * i)
              for i in range(56)]
    rois = jnp.asarray(np.array([wide + tall + normal], np.float32))
    assert rois.shape == (1, 80, 4)
    out = np.asarray(_ladder(pyr, rois))
    np.testing.assert_allclose(out, _ref(pyr, rois), rtol=1e-4, atol=2e-4)


def test_ladder_sliver_mid_tier_exact():
    """Sliver-gather multi-chunk path: 12 beyond-ladder vertical slivers
    (aspect ~1/90 at level 2 — taller than every rung) with n=80 exceed
    the sliver chunk cap (max(n // 256, J) = 8), driving the exact-gather
    while loop through two chunks. Whole batch exact."""
    rng = np.random.RandomState(22)
    B = 1
    pyr = _pyramid(rng, B)
    slivers = [[10.0 + 9.0 * i, 5.0, 18.0 + 9.0 * i, 700.0]
               for i in range(12)]
    normal = [_build(70.0 + 3.0 * i, 1.0, 4.0 + 2.0 * i, 6.0 + 2.0 * i)
              for i in range(68)]
    rois = jnp.asarray(np.array([slivers + normal], np.float32))
    assert rois.shape == (1, 80, 4)
    out = np.asarray(_ladder(pyr, rois))
    np.testing.assert_allclose(out, _ref(pyr, rois), rtol=1e-4, atol=2e-4)


@pytest.mark.parametrize("pooled,dtype", [(7, "float32"),
                                          (14, "float32"),
                                          (7, "bfloat16")])
def test_ladder_randomized_property_sweep(pooled, dtype):
    """Randomized settle of PARITY.md's 'exact for EVERY RoI' claim
    (VERDICT r3 ask #6): RoIs drawn across aspect 1-30 (both
    orientations) x sizes spanning every level band x pooled {7,14} x
    {f32, bf16}, asserting the production ladder equals the exact gather
    oracle on the same inputs. Covers base-covered, rung-covered,
    beyond-ladder-sliver, and whole-top-level regimes in one batch."""
    rng = np.random.RandomState(31 + pooled)
    B, R = 2, 24
    jdt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    pyr = [f.astype(jdt) for f in _pyramid(rng, B)]
    H_im, W_im = 832.0, 1344.0
    rois_np = np.zeros((B, R, 4), np.float32)
    for b in range(B):
        for r in range(R):
            s = float(np.exp(rng.uniform(np.log(40.0), np.log(1100.0))))
            a = float(np.exp(rng.uniform(0.0, np.log(30.0))))
            if rng.rand() < 0.5:
                a = 1.0 / a
            w = min(s * np.sqrt(a), W_im - 2.0)
            h = min(s / np.sqrt(a), H_im - 2.0)
            x = rng.uniform(0.0, W_im - 1.0 - w)
            y = rng.uniform(0.0, H_im - 1.0 - h)
            rois_np[b, r] = [x, y, x + w, y + h]
    rois = jnp.asarray(rois_np)

    out = win.multilevel_roi_align_pallas_ladder(
        pyr, SCALES, rois, pooled, 2, 2, 5, canonical_scale=224,
        canonical_level=4, interpret=True)
    ref = np.stack([np.asarray(ml.multilevel_roi_align(
        [f[b].astype(jnp.float32) for f in pyr], SCALES, rois[b], pooled,
        2, 2, 5, canonical_scale=224, canonical_level=4, chunk=8))
        for b in range(B)])
    out = np.asarray(out).astype(np.float32)
    if dtype == "bfloat16":
        # bf16 canvas: the oracle pools the SAME bf16 features in f32, so
        # the residual is bilinear-weight rounding only (~2^-8 relative).
        np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)
    else:
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=2e-4)


def test_ladder_sliver_fixup_out_qp_and_overflow():
    """The sliver gather fixup under out_qp=True (box-head production
    layout) and with more slivers than the small compaction capacity
    (forces the full-capacity escape hatch)."""
    rng = np.random.RandomState(11)
    B = 1
    pyr = _pyramid(rng, B)
    # 6 vertical slivers (aspect ~1/30 at mid sizes) + 2 normal RoIs;
    # fix_frac=64 with n=8 gives cap_small=J=8 >= cap_full -> full path;
    # also run with fix_frac=1 (cap_small >= cap_full branch).
    slivers = [[10.0 + 8 * i, 5.0, 18.0 + 8 * i, 700.0] for i in range(6)]
    rois = jnp.asarray(
        np.array([slivers + [_build(100.0, 1.0), _build(300.0, 1.0)]],
                 np.float32))
    ref = _ref(pyr, rois)
    out = np.asarray(_ladder(pyr, rois, out_qp=True))
    np.testing.assert_allclose(np.swapaxes(out, 2, 3), ref,
                               rtol=1e-4, atol=2e-4)


def test_accum_kernel_is_window_pool_transpose():
    """roi_window_accum_seg (the Pallas backward kernel) vs a numpy
    scatter of d_win = vy^T ct vx^T: the exact linear transpose of the
    window pool, including overlapping windows (sequential RMW) and the
    empty-segment no-op."""
    from detectron_tpu.ops.pallas import roi_align_kernel as rk

    rng = np.random.RandomState(0)
    B, Hc, Wc, C = 2, 32, 40, 8
    WY, WX, P = 8, 16, 7
    N, J = 16, 8

    starts = np.stack([
        rng.randint(0, B, N),
        rng.randint(0, Hc - WY + 1, N),
        rng.randint(0, (Wc - WX) // 8 + 1, N) * 8,
    ], axis=1).astype(np.int32)
    vy = rng.randn(N, P, WY).astype(np.float32)
    vx = rng.randn(N, P, WX).astype(np.float32)
    ct = rng.randn(N, P, P, C).astype(np.float32)

    out = np.asarray(rk.roi_window_accum_seg(
        jnp.zeros((B, Hc, Wc, C), jnp.float32),
        jnp.asarray([0, N // J], jnp.int32), jnp.asarray(starts),
        jnp.asarray(ct), jnp.asarray(vy), jnp.asarray(vx),
        WY, WX, P, rois_per_step=J, interpret=True))

    ref = np.zeros((B, Hc, Wc, C), np.float32)
    for j in range(N):
        dwin = np.einsum("ph,pqc,qw->hwc", vy[j], ct[j], vx[j])
        b, y0, x0 = starts[j]
        ref[b, y0:y0 + WY, x0:x0 + WX] += dwin
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-4)

    # Empty segment: the aliased canvas passes through untouched.
    out2 = np.asarray(rk.roi_window_accum_seg(
        jnp.ones((B, Hc, Wc, C), jnp.float32),
        jnp.asarray([0, 0], jnp.int32), jnp.asarray(starts),
        jnp.asarray(ct), jnp.asarray(vy), jnp.asarray(vx),
        WY, WX, P, rois_per_step=J, interpret=True))
    np.testing.assert_array_equal(out2, np.ones((B, Hc, Wc, C), np.float32))


def _bwd_vs_gather_oracle(monkeypatch, run):
    g_new = run()
    monkeypatch.setenv("DETECTRON_TPU_ROI_BWD", "gather")
    g_old = run()
    monkeypatch.delenv("DETECTRON_TPU_ROI_BWD")
    for i, (a, b) in enumerate(zip(g_new, g_old)):
        a, b = np.asarray(a), np.asarray(b)
        sc = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a / sc, b / sc, rtol=1e-4, atol=2e-5,
                                   err_msg=f"level {i}")


def test_ladder_bwd_pallas_accum_matches_gather_oracle(monkeypatch):
    """The Pallas window-accumulate ladder backward vs the retained
    gather-transpose oracle (_ladder_bwd_gather), on a mix that drives
    base, BOTH fixup rungs (multi-chunk: counts above one chunk cap),
    whole-top-level, and beyond-ladder-sliver routing."""
    rng = np.random.RandomState(17)
    B = 2
    pyr = _pyramid(rng, B, C=8)
    wide = [_build(170.0, 16.0, 4.0 + 7.0 * i, 10.0) for i in range(12)]
    tall = [_build(170.0, 1 / 16.0, 6.0 + 7.0 * i, 8.0) for i in range(12)]
    slivers = [[10.0 + 9.0 * i, 5.0, 18.0 + 9.0 * i, 700.0]
               for i in range(3)]
    normal = [_build(80.0 + 9.0 * i, 1.0, 4.0 + 2.0 * i, 6.0 + i)
              for i in range(12)] + [_build(900.0, 1.0)]
    rois = jnp.asarray(np.array([wide + tall + slivers + normal] * B,
                                np.float32))
    ctan = jnp.asarray(rng.randn(B, rois.shape[1], 7, 7, 8)
                       .astype(np.float32))

    def run():
        def f(p):
            out = win.multilevel_roi_align_ladder_trainable(
                p, SCALES, rois, 7, 2, 2, 5, 224, 4,
                ((32, 40), (64, 48), (32, 96)), 8, True, False, False)
            return jnp.sum(out * ctan)

        return jax.grad(f)(list(pyr))

    _bwd_vs_gather_oracle(monkeypatch, run)


def test_ladder_bwd_bf16_pyramid_matches_gather_oracle(monkeypatch):
    """bf16 pyramid (production dtype): the Pallas backward transposes
    with f32 interpolation weights while the forward pools with bf16
    weights, so vs the gather oracle only the per-RoI ROUTING
    (ok/covered/rid agreement) is exact and the values carry bf16 weight
    rounding — looser tolerance, both grads cast back to f32 to compare."""
    rng = np.random.RandomState(19)
    B = 2
    pyr = [f.astype(jnp.bfloat16) for f in _pyramid(rng, B, C=8)]
    wide = [_build(170.0, 16.0, 4.0 + 7.0 * i, 10.0) for i in range(6)]
    slivers = [[10.0 + 9.0 * i, 5.0, 18.0 + 9.0 * i, 700.0]
               for i in range(2)]
    normal = [_build(80.0 + 9.0 * i, 1.0) for i in range(6)] + [
        _build(900.0, 1.0), _build(400.0, 0.25)]
    rois = jnp.asarray(np.array([wide + slivers + normal] * B, np.float32))
    ctan = jnp.asarray(rng.randn(B, rois.shape[1], 7, 7, 8)
                       .astype(np.float32))

    def run():
        def f(p):
            out = win.multilevel_roi_align_ladder_trainable(
                p, SCALES, rois, 7, 2, 2, 5, 224, 4,
                ((32, 40), (64, 48), (32, 96)), 8, True, False, False)
            return jnp.sum(out.astype(jnp.float32) * ctan)

        return [g.astype(jnp.float32) for g in jax.grad(f)(list(pyr))]

    g_new = run()
    monkeypatch.setenv("DETECTRON_TPU_ROI_BWD", "gather")
    g_old = run()
    monkeypatch.delenv("DETECTRON_TPU_ROI_BWD")
    for i, (a, b) in enumerate(zip(g_new, g_old)):
        a, b = np.asarray(a), np.asarray(b)
        sc = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a / sc, b / sc, rtol=2e-2, atol=8e-3,
                                   err_msg=f"level {i}")


def test_ladder_bwd_single_rung_is_forward_transpose():
    """Regression (ADVICE r4 medium): with NO fixup rungs (single-rung
    ladder, narrow_base=False) the forward early-returns the clamped
    base-window result for every RoI — the backward must transpose THAT
    map (all RoIs through the base window), not zero uncovered RoIs' base
    contribution and gather-transpose them. Verified by the dot-product
    identity <f(t), ct> == <vjp_f(ct), t> (f is linear in the pyramid),
    on a mix with uncovered wide mid-level RoIs."""
    rng = np.random.RandomState(20)
    B = 1
    pyr = _pyramid(rng, B, C=8)
    rois = jnp.asarray(np.array([
        [_build(170.0, 16.0), _build(400.0, 8.0, 10.0, 40.0),
         _build(150.0, 1.0), _build(900.0, 1.0), _build(90.0, 1.0),
         [10.0, 5.0, 18.0, 700.0]]], np.float32))
    ctan = jnp.asarray(rng.randn(B, rois.shape[1], 7, 7, 8)
                       .astype(np.float32))
    tangent = [jnp.asarray(rng.randn(*f.shape).astype(np.float32))
               for f in pyr]

    def f(p):
        return win.multilevel_roi_align_ladder_trainable(
            p, SCALES, rois, 7, 2, 2, 5, 224, 4,
            ((32, 40),), 8, True, False, False)

    # f is linear in the pyramid: f(tangent) IS the JVP.
    lhs = float(jnp.sum(f(tangent) * ctan))
    grads = jax.grad(lambda p: jnp.sum(f(p) * ctan))(list(pyr))
    rhs = float(sum(jnp.sum(g * t) for g, t in zip(grads, tangent)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-4)


def test_pallas_trainable_bwd_accum_matches_gather_oracle(monkeypatch):
    """The single-window trainable path's Pallas accumulate backward vs
    its dynamic_slice linear-transpose oracle (clamping included: the
    transpose must match the forward's clamped map, not exact RoIAlign)."""
    rng = np.random.RandomState(18)
    B = 2
    pyr = _pyramid(rng, B, C=8)
    rois = jnp.asarray(np.array([
        [_build(150.0, 1.0), _build(400.0, 4.0), _build(900.0, 1.0),
         _build(200.0, 0.33), _build(500.0, 6.0), _build(120.0, 1.0)]] * B,
        np.float32))
    ctan = jnp.asarray(rng.randn(B, 6, 7, 7, 8).astype(np.float32))

    def run():
        def f(p):
            out = win.multilevel_roi_align_pallas_trainable(
                p, SCALES, rois, 7, 2, 2, 5, 224, 4, 32, 8, True,
                pyr[-1].shape[2], False)
            return jnp.sum(out * ctan)

        return jax.grad(f)(list(pyr))

    _bwd_vs_gather_oracle(monkeypatch, run)
