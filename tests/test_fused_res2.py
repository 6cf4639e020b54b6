"""Fused res2 Pallas kernel vs the XLA bottleneck stage.

The kernel (ops/pallas/fused_stem_kernel.py) runs all three res2 bottleneck
blocks on a y-tile per grid step so the stage's activations never round-trip
HBM between convs (round-4 xprof: ~40 ms/step of stem+res2 convs at
2-60 TF/s, HBM-bound — PERF.md). Parity oracle: models/resnet.apply_stage,
the production XLA path, at matched inter-op rounding.

Reference anchor: lib/modeling/ResNet.py :: add_stage (res2 semantics).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detectron_tpu.core import config
from detectron_tpu.core.config import cfg
from detectron_tpu.models import resnet
from detectron_tpu.ops.pallas import fused_stem_kernel as fk


def _stage_params(rng, gaussian=True):
    """res2 params with non-degenerate affines (random s/b so BN folding is
    actually exercised, not the identity)."""
    params = resnet.init_stage(rng, 3, 64, 256, 64)
    r = np.random.RandomState(0)
    for bp in params:
        for k in list(bp):
            if k.endswith("_bn"):
                c = bp[k]["s"].shape[0]
                bp[k] = {
                    "s": jnp.asarray(r.uniform(0.5, 1.5, c), jnp.float32),
                    "b": jnp.asarray(r.uniform(-0.3, 0.3, c), jnp.float32),
                }
    return params


def _xla_stage(params, x):
    return resnet.apply_stage(params, x, stride=1)


@pytest.mark.parametrize("boundary", ["kernel", "hbm"])
@pytest.mark.parametrize("dtype,tol", [
    (jnp.float32, 3e-5),
    (jnp.bfloat16, 0.13),
])
def test_fused_res2_matches_xla_stage(dtype, tol, boundary):
    """Interpret-mode kernel == XLA stage on random input, both dtypes.

    bf16 tolerance: the kernel folds BN into the conv weights and adds
    block 0's shortcut in f32 pre-cast, while the XLA path convolves,
    affines, and adds in bf16 — every intermediate rounds differently.
    0.13 on unit-variance 256-channel activations is ~2 bf16 ulps at the
    observed magnitudes (and f32 parity at 3e-5 pins the math itself).
    """
    config.reset_cfg()
    params = _stage_params(jax.random.PRNGKey(0))
    r = np.random.RandomState(1)
    x = jnp.asarray(r.randn(2, 16, 32, 64), dtype)

    ref = _xla_stage(params, x)
    w = fk.fold_res2_weights(params, dtype)
    out = fk.fused_res2(x, tuple(w), ty=8, interpret=True,
                        boundary=boundary)

    assert out.shape == ref.shape == (2, 16, 32, 256)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=tol, rtol=tol)


def test_fused_res2_edge_tiles_zero_halo():
    """Single-tile-high input (every halo row is an edge): the kernel's
    clamped-duplicate-then-zero halo must reproduce SAME zero padding."""
    config.reset_cfg()
    params = _stage_params(jax.random.PRNGKey(2))
    r = np.random.RandomState(3)
    x = jnp.asarray(r.randn(1, 8, 16, 64), jnp.float32)

    ref = _xla_stage(params, x)
    w = fk.fold_res2_weights(params, jnp.float32)
    out = fk.fused_res2(x, tuple(w), ty=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)


def test_apply_body_fused_matches_default():
    """apply_body with TPU.FUSED_RES2 == the default path end-to-end
    (stem + pool feed the kernel; res3+ consume its output)."""
    config.reset_cfg()
    cfg.immutable(False)
    params = resnet.init_body(jax.random.PRNGKey(4), 50, 2)
    r = np.random.RandomState(5)
    x = jnp.asarray(r.randn(1, 64, 64, 3), jnp.float32)

    outs_ref = resnet.apply_body(params, x, num_stages=2)
    config.merge_cfg_from_list(["TPU.FUSED_RES2", "True"])
    with fk.force_interpret():
        outs_fused = resnet.apply_body(params, x, num_stages=2)

    for a, b in zip(outs_ref, outs_fused):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-5)


def test_apply_body_fused_falls_back_when_unsupported():
    """Shape/config guards: GN bodies, ResNeXt groups, and ragged shapes
    must silently take the XLA stage (same outputs, no error)."""
    config.reset_cfg()
    cfg.immutable(False)
    config.merge_cfg_from_list(["TPU.FUSED_RES2", "True"])
    params = resnet.init_body(jax.random.PRNGKey(6), 50, 2)
    r = np.random.RandomState(7)
    # H=72 -> post-stem 18 rows: not a multiple of any legal ty -> fallback.
    x = jnp.asarray(r.randn(1, 72, 64, 3), jnp.float32)
    outs = resnet.apply_body(params, x, num_stages=2)

    config.reset_cfg()
    outs_ref = resnet.apply_body(params, x, num_stages=2)
    for a, b in zip(outs, outs_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0,
                                   rtol=0)


def test_fused_res2_gradients_still_flow_to_res3():
    """With FREEZE_AT=2 (every reference config) the fused stage carries no
    tangents — jax.grad through the full body must succeed and match the
    default path's res3 gradients."""
    config.reset_cfg()
    cfg.immutable(False)
    params = resnet.init_body(jax.random.PRNGKey(8), 50, 2)
    r = np.random.RandomState(9)
    x = jnp.asarray(r.randn(1, 64, 64, 3), jnp.float32)

    def loss(p, fused):
        if fused:
            config.merge_cfg_from_list(["TPU.FUSED_RES2", "True"])
        else:
            config.merge_cfg_from_list(["TPU.FUSED_RES2", "False"])
        outs = resnet.apply_body(p, x, num_stages=2, freeze_at=2)
        return jnp.sum(outs[-1].astype(jnp.float32) ** 2)

    g_ref = jax.grad(lambda p: loss(p, False))(params)
    with fk.force_interpret():
        g_fused = jax.grad(lambda p: loss(p, True))(params)

    # Frozen stages' grads are zero either way; res3 grads must agree.
    # Tolerance: the kernel's f32 accumulation order differs from XLA's
    # (forward parity 3e-5), and the squared loss amplifies that into the
    # gradients — this asserts correct FLOW, bit-level parity is the
    # forward tests' job.
    ref_leaves = jax.tree.leaves(g_ref["res3"])
    fused_leaves = jax.tree.leaves(g_fused["res3"])
    assert any(np.abs(np.asarray(l)).max() > 0 for l in ref_leaves)
    for a, b in zip(ref_leaves, fused_leaves):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-6
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-4)


def test_stem_pool_pack_matches_xla_postops():
    """stem_pool_pack (affine+relu+3x3/2 SAME maxpool+x-pair pack) == the
    XLA stem post-ops followed by a host pack, bf16."""
    from detectron_tpu.models import layers as L

    config.reset_cfg()
    r = np.random.RandomState(7)
    x = jnp.asarray(r.randn(2, 32, 64, 64) * 2.0, jnp.bfloat16)
    s = jnp.asarray(r.uniform(0.5, 1.5, 64), jnp.float32)
    b = jnp.asarray(r.uniform(-0.5, 0.5, 64), jnp.float32)

    ref = L.relu(x.astype(jnp.float32) * s + b).astype(jnp.bfloat16)
    ref = L.max_pool(ref, window=3, stride=2, padding=((1, 1), (1, 1)))
    ref = np.asarray(ref, np.float32)          # (2, 16, 32, 64)
    ref_packed = np.concatenate([ref[:, :, 0::2], ref[:, :, 1::2]], -1)

    out = fk.stem_pool_pack(x, s, b, typ=8, interpret=True)
    assert out.shape == (2, 16, 16, 128)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref_packed,
                               atol=0.02, rtol=0.02)


def test_apply_body_fused_packed_bf16_matches_default():
    """bf16 apply_body with TPU.FUSED_RES2 takes the v3 packed pipeline
    (stem_pool_pack -> fused_res2(boundary=packed)) end-to-end."""
    config.reset_cfg()
    cfg.immutable(False)
    params = resnet.init_body(jax.random.PRNGKey(6), 50, 2)
    r = np.random.RandomState(8)
    x = jnp.asarray(r.randn(1, 64, 64, 3), jnp.bfloat16)

    outs_ref = resnet.apply_body(params, x, num_stages=2)
    config.merge_cfg_from_list(["TPU.FUSED_RES2", "True"])
    with fk.force_interpret():
        outs_fused = resnet.apply_body(params, x, num_stages=2)

    for a, b in zip(outs_ref, outs_fused):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        assert a.shape == b.shape
        # bf16 inter-op rounding differs (kernel folds BN, f32 shortcut
        # adds); same tolerance class as the bf16 stage parity test.
        np.testing.assert_allclose(a, b, atol=0.2, rtol=0.2)
