"""ResNet / ResNeXt conv bodies, Detectron semantics.

Functional rebuild of the reference's lib/modeling/ResNet.py (symbols:
ResNet50_conv4_body, ResNet50_conv5_body, ResNet101_conv4_body,
ResNet101_conv5_body, ResNet152_conv5_body, add_stage, add_residual_block,
bottleneck_transformation, basic_bn_stem, ResNet_roi_conv5_head), with:

- frozen BN as AffineChannel (all bodies; reference lib/nn/modules/affine.py),
  or GroupNorm when RESNETS.USE_GN,
- RESNETS.STRIDE_1X1 toggling the Caffe (stride on 1x1) vs torch (stride on
  3x3) bottleneck convention,
- grouped 3x3 convs for ResNeXt (RESNETS.NUM_GROUPS / WIDTH_PER_GROUP),
- RESNETS.RES5_DILATION for dilated C4-style res5,
- RESNETS.FREEZE_AT implemented with lax.stop_gradient over the frozen
  stages' params (the functional equivalent of requires_grad=False).

Layouts are TPU-native: NHWC activations, HWIO kernels. The param tree keys
mirror Caffe2 blob names (res2.0.branch2a.w <-> res2_0_branch2a_w) so the
Detectron .pkl importer is a mechanical re-keying
(see utils/detectron_weight_helper.py).

Input images follow the reference convention: BGR channel order, pixel means
subtracted, zero-padded to static shape.
"""

import jax
import jax.numpy as jnp

from detectron_tpu.core.config import cfg
from detectron_tpu.models import layers as L

# (n2, n3, n4, n5) block counts
BLOCK_COUNTS = {
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}


def _norm_init(channels):
    return L.init_affine(channels) if not cfg.RESNETS.USE_GN \
        else L.init_group_norm(channels)


def _norm_apply(p, x):
    if cfg.RESNETS.USE_GN:
        g = L.get_group_gn(
            p["s"].shape[0], cfg.GROUP_NORM.DIM_PER_GP, cfg.GROUP_NORM.NUM_GROUPS
        )
        return L.group_norm(p, x, g, cfg.GROUP_NORM.EPSILON)
    # AffineChannel params are frozen BN statistics: the reference freezes
    # every AffineChannel2d (lib/nn/modules/affine.py; requires_grad=False in
    # lib/modeling/ResNet.py). stop_gradient keeps them constant (the
    # optimizer additionally exempts them from weight decay — see
    # parallel/optimizer.py :: _param_kind 'affine').
    return L.affine_channel(jax.lax.stop_gradient(p), x)


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------

def init_bottleneck(rng, in_c, out_c, inner_c, has_shortcut, groups=1):
    ks = jax.random.split(rng, 4)
    p = {
        "branch2a": L.init_conv(ks[0], 1, 1, in_c, inner_c, bias=False),
        "branch2a_bn": _norm_init(inner_c),
        "branch2b": L.init_conv(ks[1], 3, 3, inner_c, inner_c, groups=groups,
                                bias=False),
        "branch2b_bn": _norm_init(inner_c),
        "branch2c": L.init_conv(ks[2], 1, 1, inner_c, out_c, bias=False),
        "branch2c_bn": _norm_init(out_c),
    }
    if has_shortcut:
        p["branch1"] = L.init_conv(ks[3], 1, 1, in_c, out_c, bias=False)
        p["branch1_bn"] = _norm_init(out_c)
    return p


def apply_bottleneck(p, x, stride, dilation=1, groups=1):
    s1 = stride if cfg.RESNETS.STRIDE_1X1 else 1
    s3 = 1 if cfg.RESNETS.STRIDE_1X1 else stride

    h = L.conv2d(p["branch2a"], x, stride=s1, padding=0)
    h = L.relu(_norm_apply(p["branch2a_bn"], h))
    h = L.conv2d(p["branch2b"], h, stride=s3, padding=dilation,
                 dilation=dilation, groups=groups)
    h = L.relu(_norm_apply(p["branch2b_bn"], h))
    h = L.conv2d(p["branch2c"], h, stride=1, padding=0)
    h = _norm_apply(p["branch2c_bn"], h)

    if "branch1" in p:
        sc = L.conv2d(p["branch1"], x, stride=stride, padding=0)
        sc = _norm_apply(p["branch1_bn"], sc)
    else:
        sc = x
    return L.relu(h + sc)


def init_stage(rng, n_blocks, in_c, out_c, inner_c, groups=1):
    ks = jax.random.split(rng, n_blocks)
    blocks = []
    for i in range(n_blocks):
        blocks.append(
            init_bottleneck(
                ks[i], in_c if i == 0 else out_c, out_c, inner_c,
                has_shortcut=(i == 0), groups=groups,
            )
        )
    return blocks


def apply_stage(blocks, x, stride, dilation=1, groups=1):
    for i, bp in enumerate(blocks):
        x = apply_bottleneck(bp, x, stride if i == 0 else 1, dilation, groups)
    return x


# ---------------------------------------------------------------------------
# Bodies
# ---------------------------------------------------------------------------

def _inner_dims():
    """Per-stage (inner, outer) channel plan for ResNet/ResNeXt."""
    ng = cfg.RESNETS.NUM_GROUPS
    wpg = cfg.RESNETS.WIDTH_PER_GROUP
    base_inner = ng * wpg  # 64 for ResNet (1x64), 256 for 32x8d
    inner = [base_inner * (2**i) for i in range(4)]
    outer = [256 * (2**i) for i in range(4)]
    return inner, outer, ng


def init_body(rng, depth, num_stages):
    """Body params for ResNet-{depth} with `num_stages` stages (3 => C4 body
    ending at res4/stride 16; 4 => conv5 body for FPN)."""
    counts = BLOCK_COUNTS[depth]
    inner, outer, ng = _inner_dims()
    ks = jax.random.split(rng, 1 + num_stages)
    p = {
        "conv1": L.init_conv(ks[0], 7, 7, 3, 64, bias=False),
        "res_conv1_bn": _norm_init(64),
    }
    in_c = 64
    for s in range(num_stages):
        name = "res{}".format(s + 2)
        dilation = cfg.RESNETS.RES5_DILATION if s == 3 else 1
        del dilation  # applied at apply time
        p[name] = init_stage(ks[1 + s], counts[s], in_c, outer[s], inner[s],
                             groups=ng)
        in_c = outer[s]
    return p


def _s2d_stem_conv(conv1_p, x):
    """7x7/s2/p3 stem conv as an EXACT 4x4/s1 conv on 2x2 space-to-depth
    blocked input (cfg.TPU.S2D_STEM).

    Derivation: y[i,j] = sum_{a,b<7} w[a,b] x[2i+a-3, 2j+b-3]. With x
    padded by 4 (x4[u] = x[u-4]) and blocked by 2 (x2[p,(dy)] = x4[2p+dy]),
    the sample index 2i+a-3 = 2(i+alpha) + dy where a+1 = 2*alpha + dy — a
    VALID 4x4 stride-1 conv over 12 = 2*2*3 channels, whose kernel is the
    7x7 kernel zero-padded to 8x8 (one leading zero row/col) and reshaped
    with the same (dy, dx, c) channel order as the blocked input. The image
    conv's MXU input-channel utilization rises 4x (C=3 -> 12); the math is
    bit-identical up to f32 accumulation order.
    """
    w = conv1_p["w"]  # (7, 7, 3, 64) HWIO
    B, H, W, C = x.shape
    assert H % 2 == 0 and W % 2 == 0, (H, W)
    O = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (4, 4), (4, 4), (0, 0)))
    P, Q = (H + 8) // 2, (W + 8) // 2
    x2 = xp.reshape(B, P, 2, Q, 2, C).transpose(0, 1, 3, 2, 4, 5)
    x2 = x2.reshape(B, P, Q, 4 * C)
    wp = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))  # (8, 8, C, O)
    w2 = wp.reshape(4, 2, 4, 2, C, O).transpose(0, 2, 1, 3, 4, 5)
    w2 = w2.reshape(4, 4, 4 * C, O).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x2, w2, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y[:, : H // 2, : W // 2, :]
    if "b" in conv1_p:
        y = y + conv1_p["b"].astype(y.dtype)
    return y


def _s2d_blocked_stem_conv(conv1_p, x2):
    """Stem conv on HOST-blocked input (cfg.TPU.S2D_INPUT): x2 is
    (B, (H+8)//2, (W+8)//2, 12) from utils/blob.space_to_depth (pad 4 each
    side, 2x2 block, channel order (dy, dx, c)). Same kernel transform as
    _s2d_stem_conv, but the blocked reshape — the HBM round trip that made
    the in-graph TPU.S2D_STEM variant LOSE 4.6 ms (PERF.md) — happened on
    the host for free."""
    w = conv1_p["w"]  # (7, 7, 3, 64) HWIO
    B, P, Q, C4 = x2.shape
    C = C4 // 4
    O = w.shape[-1]
    wp = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))  # (8, 8, C, O)
    w2 = wp.reshape(4, 2, 4, 2, C, O).transpose(0, 2, 1, 3, 4, 5)
    w2 = w2.reshape(4, 4, 4 * C, O).astype(x2.dtype)
    y = jax.lax.conv_general_dilated(
        x2, w2, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y[:, : P - 4, : Q - 4, :]
    if "b" in conv1_p:
        y = y + conv1_p["b"].astype(y.dtype)
    return y


def apply_body(p, x, num_stages, freeze_at=None):
    """Run the body; returns list of per-stage outputs [res2, ..., resN].

    freeze_at: stages <= freeze_at (2-indexed, stage 1 = stem) get
    stop_gradient'ed params — the functional twin of the reference's
    lib/modeling/ResNet.py :: freeze_params / RESNETS.FREEZE_AT.
    """
    if freeze_at is None:
        freeze_at = cfg.RESNETS.FREEZE_AT
    assert freeze_at in (0, 2, 3, 4, 5)
    _, _, ng = _inner_dims()

    stem_p = {"conv1": p["conv1"], "res_conv1_bn": p["res_conv1_bn"]}
    if freeze_at >= 2:
        stem_p = jax.lax.stop_gradient(stem_p)
    if cfg.TPU.S2D_INPUT:
        h = _s2d_blocked_stem_conv(stem_p["conv1"], x)
    elif cfg.TPU.S2D_STEM:
        h = _s2d_stem_conv(stem_p["conv1"], x)
    else:
        h = L.conv2d(stem_p["conv1"], x, stride=2, padding=3)

    # Fused stem/res2 eligibility (all gates up front: the v3 "packed"
    # pipeline replaces the stem post-ops themselves, so the decision is
    # needed before them). Modes:
    #   "packed": stem_pool_pack kernel (affine+relu+pool+pack in one
    #             HBM pass) -> fused_res2(boundary="packed"). Production.
    #   "auto":   XLA stem post-ops -> fused_res2 (its own boundary
    #             default) — non-bf16 or pool-ineligible geometry.
    fused_mode = None
    fk = None
    if cfg.TPU.FUSED_RES2 and freeze_at >= 2 and num_stages >= 1:
        from detectron_tpu.ops.pallas import fused_stem_kernel as _fk
        # Mosaic kernels only exist on TPU backends: CPU runs (virtual
        # -device tests, dryrun_multichip, the CPU CLI path) take the
        # XLA path unless a test forces interpret mode.
        on_tpu = (jax.default_backend() != "cpu" or _fk._FORCE_INTERPRET)
        Hp, Wp = h.shape[1], h.shape[2]
        ty = (_fk.pick_ty(Hp // 2, Wp // 2)
              if Hp % 2 == 0 and Wp % 2 == 0 else None)
        if on_tpu and ty is not None and not cfg.RESNETS.USE_GN \
                and ng == 1 and _fk.res2_params_supported(p["res2"]):
            fk = _fk
            if (h.dtype == jnp.bfloat16 and Hp % (2 * ty) == 0
                    and Wp % 32 == 0):
                fused_mode = "packed"
            else:
                fused_mode = "auto"

    if fused_mode == "packed":
        sb = stem_p["res_conv1_bn"]
        h = fk.stem_pool_pack(h, sb["s"], sb["b"], typ=ty)
    else:
        h = L.relu(_norm_apply(stem_p["res_conv1_bn"], h))
        h = L.max_pool(h, window=3, stride=2, padding=((1, 1), (1, 1)))

    outs = []
    for s in range(num_stages):
        name = "res{}".format(s + 2)
        sp = p[name]
        if freeze_at >= s + 2:
            sp = jax.lax.stop_gradient(sp)
        if s == 3 and cfg.RESNETS.RES5_DILATION != 1:
            stride, dil = 1, cfg.RESNETS.RES5_DILATION
        else:
            stride, dil = (1 if s == 0 else 2), 1
        if s == 0 and fused_mode is not None:
            # Fused res2 Pallas kernel: the whole stage in one HBM pass
            # (ops/pallas/fused_stem_kernel.py). Only for the frozen
            # canonical stage — freeze_at >= 2 guarantees no tangents reach
            # the pallas_call (it has no AD rule); the eligibility gates
            # (GN/ResNeXt/ragged-canvas/backend) ran before the stem
            # post-ops above.
            if fused_mode == "packed":
                dtype = jnp.bfloat16
                w = fk.fold_res2_weights(sp, dtype)
                h = fk.fused_res2(h, w, ty=ty, boundary="packed")
            else:
                w = fk.fold_res2_weights(sp, h.dtype)
                h = fk.fused_res2(h, w, ty=ty)
            outs.append(h)
            continue
        if cfg.TPU.REMAT_BODY:
            stage_fn = jax.checkpoint(
                lambda sp_, h_, _stride=stride, _dil=dil: apply_stage(
                    sp_, h_, _stride, _dil, ng))
            h = stage_fn(sp, h)
        else:
            h = apply_stage(sp, h, stride, dil, ng)
        outs.append(h)
    return outs


# ---------------------------------------------------------------------------
# C4 RoI head (res5 on pooled features)
# ---------------------------------------------------------------------------

def init_roi_conv5_head(rng, in_c=1024):
    inner, outer, ng = _inner_dims()
    return {"res5": init_stage(rng, BLOCK_COUNTS[50][3], in_c, outer[3],
                               inner[3], groups=ng)}


def apply_roi_conv5_head(p, roi_feat):
    """roi_feat: (R, 14, 14, 1024) -> (R, 2048) via res5 + global avg pool.
    Reference anchor: lib/modeling/ResNet.py :: ResNet_roi_conv5_head.
    RES5_DILATION=2 keeps stride 1 (dilated head); default strides 2."""
    _, _, ng = _inner_dims()
    if cfg.RESNETS.RES5_DILATION != 1:
        stride, dil = 1, cfg.RESNETS.RES5_DILATION
    else:
        stride, dil = 2, 1
    h = apply_stage(p["res5"], roi_feat, stride, dil, ng)
    return jnp.mean(h, axis=(1, 2))


# ---------------------------------------------------------------------------
# Named body factories (the cfg.MODEL.CONV_BODY registry targets)
# ---------------------------------------------------------------------------

def body_spec(conv_body_name):
    """Parse a reference CONV_BODY string into (depth, num_stages, is_fpn).

    Accepts e.g. 'ResNet.ResNet50_conv4_body', 'ResNet.ResNet101_conv5_body',
    'FPN.fpn_ResNet50_conv5_body', 'FPN.fpn_ResNet152_conv5_P2only_body'.
    """
    name = conv_body_name.split(".")[-1]
    is_fpn = conv_body_name.startswith("FPN.") or name.startswith("fpn_")
    depth = None
    for d in (50, 101, 152):
        if "ResNet{}".format(d) in name:
            depth = d
    assert depth is not None, "Unrecognized CONV_BODY: " + conv_body_name
    num_stages = 4 if "conv5" in name else 3
    return depth, num_stages, is_fpn
