import numpy as np
import jax
import jax.numpy as jnp
import pytest

from detectron_tpu.core import config
from detectron_tpu.core.config import cfg
from detectron_tpu.models import model_builder as mb
from detectron_tpu.parallel import mesh as mesh_mod
from detectron_tpu.parallel import optimizer as opt
from detectron_tpu.parallel import train_step as ts


def _tiny_train_cfg(mask_on=False):
    config.merge_cfg_from_list([
        "MODEL.CONV_BODY", "FPN.fpn_ResNet50_conv5_body",
        "MODEL.FASTER_RCNN", "True",
        "MODEL.MASK_ON", str(mask_on),
        "MODEL.NUM_CLASSES", "4",
        "FPN.FPN_ON", "True",
        "FPN.MULTILEVEL_ROIS", "True",
        "FPN.MULTILEVEL_RPN", "True",
        "FAST_RCNN.ROI_BOX_HEAD", "fast_rcnn_heads.roi_2mlp_head",
        "FAST_RCNN.ROI_XFORM_METHOD", "RoIAlign",
        "FAST_RCNN.ROI_XFORM_RESOLUTION", "7",
        "FAST_RCNN.ROI_XFORM_SAMPLING_RATIO", "2",
        "FAST_RCNN.MLP_HEAD_DIM", "32",
        "MRCNN.ROI_MASK_HEAD", "mask_rcnn_heads.mask_rcnn_fcn_head_v1up4convs",
        "MRCNN.RESOLUTION", "14",
        "MRCNN.ROI_XFORM_RESOLUTION", "7",
        "MRCNN.ROI_XFORM_SAMPLING_RATIO", "2",
        "MRCNN.DILATION", "1",
        "TRAIN.IMS_PER_BATCH", "2",
        "TRAIN.BATCH_SIZE_PER_IM", "32",
        "TRAIN.RPN_PRE_NMS_TOP_N", "64",
        "TRAIN.RPN_POST_NMS_TOP_N", "16",
        "TRAIN.RPN_BATCH_SIZE_PER_IM", "32",
        "SOLVER.BASE_LR", "0.01",
        "SOLVER.WARM_UP_ITERS", "2",
        "SOLVER.LR_POLICY", "steps_with_decay",
        "SOLVER.STEPS", "[0, 100]",
        "SOLVER.MAX_ITER", "200",
        "TPU.NMS_TILE_SIZE", "32",
        "TPU.MAX_GT_BOXES", "8",
    ])
    config.assert_and_infer_cfg(make_immutable=False)


def _tiny_batch(B=2, size=64, G=8):
    rng = np.random.RandomState(0)
    batch = {
        "images": jnp.asarray(rng.randn(B, size, size, 3), jnp.float32),
        "im_info": jnp.asarray([[size, size, 1.0]] * B, jnp.float32),
        "gt_boxes": jnp.asarray(
            np.stack([np.array([[4, 4, 30, 30], [20, 20, 60, 60]] + [[0, 0, 0, 0]] * (G - 2),
                               np.float32)] * B)),
        "gt_classes": jnp.asarray(
            np.stack([np.array([1, 3] + [0] * (G - 2), np.int32)] * B)),
        "gt_valid": jnp.asarray(
            np.stack([np.array([1, 1] + [0] * (G - 2), bool)] * B)),
        "crowd_boxes": jnp.zeros((B, 2, 4), jnp.float32),
        "crowd_valid": jnp.zeros((B, 2), bool),
    }
    if cfg.MODEL.MASK_ON:
        masks = np.zeros((B, G, 28, 28), np.float32)
        masks[:, :, 6:22, 6:22] = 1.0
        batch["gt_masks"] = jnp.asarray(masks)
    return batch


def test_train_step_runs_and_decreases_nothing_nan():
    _tiny_train_cfg()
    params = mb.init_model(jax.random.PRNGKey(0))
    opt_state = opt.init_opt_state(params)
    batch = _tiny_batch()
    rng = jax.random.PRNGKey(1)

    params2, opt_state2, stats = jax.jit(ts.train_step)(
        params, opt_state, batch, rng)
    for k, v in stats.items():
        assert np.isfinite(np.asarray(v)).all(), (k, v)
    assert int(opt_state2["step"]) == 1
    # Params changed
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                     params, params2)
    total_change = sum(jax.tree.leaves(d))
    assert total_change > 0


def test_train_step_mask_on():
    _tiny_train_cfg(mask_on=True)
    params = mb.init_model(jax.random.PRNGKey(0))
    opt_state = opt.init_opt_state(params)
    batch = _tiny_batch()
    _, _, stats = jax.jit(ts.train_step)(
        params, opt_state, batch, jax.random.PRNGKey(1))
    assert "loss_mask" in stats
    assert np.isfinite(float(stats["loss_mask"]))


def test_pjit_train_step_on_virtual_mesh():
    _tiny_train_cfg()
    mesh = mesh_mod.make_mesh()  # 8 virtual CPU devices from conftest
    assert mesh.devices.size == 8
    config.merge_cfg_from_list(["TRAIN.IMS_PER_BATCH", "8"])
    params = mb.init_model(jax.random.PRNGKey(0))
    opt_state = opt.init_opt_state(params)
    batch = _tiny_batch(B=8)
    with mesh:
        step = ts.make_pjit_train_step(mesh, donate=False)
        batch = mesh_mod.shard_batch(mesh, batch)
        p2, o2, stats = step(params, opt_state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(stats["loss"]))


def test_lr_schedule():
    _tiny_train_cfg()
    lr_fn = opt.make_lr_fn()
    # Warmup: step 0 -> base * warm_factor
    lr0 = float(lr_fn(jnp.int32(0)))
    assert lr0 == pytest.approx(0.01 / 3.0, rel=1e-5)
    # After warmup, before decay step 100
    assert float(lr_fn(jnp.int32(50))) == pytest.approx(0.01)
    # After decay step
    assert float(lr_fn(jnp.int32(150))) == pytest.approx(0.001)


def test_momentum_correction_at_lr_decay():
    """SOLVER.SCALE_MOMENTUM (reference utils/net.update_learning_rate ->
    Detectron _CorrectMomentum): at a STEPS decay boundary the Caffe2-form
    momentum buffer (which carries lr) must be rescaled by new_lr/old_lr;
    warmup's small per-step ramps stay under the 1.1 threshold and must
    NOT trigger it."""
    _tiny_train_cfg()
    # base 0.01, fine-grained warmup (500 iters, like the reference
    # configs), decay x0.1 at step 100... which sits inside warmup — move
    # decay out by testing steps beyond it; the schedule here: warmup to
    # 500 then steady 0.01 (STEPS [0, 100] decays INSIDE warmup where the
    # warmup lr applies, so use explicit steps below).
    config.merge_cfg_from_list([
        "SOLVER.WARM_UP_ITERS", "20", "SOLVER.STEPS", "[0, 100]"])
    p = {"box_head": {"fc6": {"w": jnp.ones((1, 1, 1, 8), jnp.float32)}}}
    g = jax.tree.map(lambda x: jnp.full_like(x, 0.1), p)

    def v_after(step, v0):
        o = {"momentum": jax.tree.map(lambda x: jnp.full_like(x, v0), p),
             "step": jnp.int32(step)}
        _, o2, lr = opt.apply_updates(p, g, o)
        return float(jax.tree.leaves(o2["momentum"])[0][0, 0, 0, 0]), \
            float(lr)

    mu = cfg.SOLVER.MOMENTUM
    wd = cfg.SOLVER.WEIGHT_DECAY
    # Mid-schedule (no boundary): v = mu*v0 + lr*(g + wd*p)
    v, lr = v_after(50, 1.0)
    assert lr == pytest.approx(0.01)
    assert v == pytest.approx(mu * 1.0 + 0.01 * (0.1 + wd), rel=1e-5)
    # At the decay step (lr 0.01 -> 0.001, ratio 0.1 < 1/1.1): buffered
    # history scaled by 0.1 first.
    v, lr = v_after(100, 1.0)
    assert lr == pytest.approx(0.001)
    assert v == pytest.approx(mu * 0.1 + 0.001 * (0.1 + wd), rel=1e-5)
    # Inside a fine-grained warmup the per-step ratio is < 1.1: no
    # correction (the threshold exists exactly so warmup ramps don't
    # rescale the buffer every step).
    v, lr = v_after(10, 1.0)
    lr9, lr10 = [0.01 * (1.0 / 3.0 + (1 - 1.0 / 3.0) * s / 20.0)
                 for s in (9, 10)]
    assert lr == pytest.approx(lr10, rel=1e-4)
    assert lr10 / lr9 < cfg.SOLVER.SCALE_MOMENTUM_THRESHOLD
    assert v == pytest.approx(mu * 1.0 + lr10 * (0.1 + wd), rel=1e-4)


def test_train_step_with_remat():
    _tiny_train_cfg()
    config.merge_cfg_from_list(["TPU.REMAT_BODY", "True"])
    params = mb.init_model(jax.random.PRNGKey(0))
    opt_state = opt.init_opt_state(params)
    batch = _tiny_batch()
    p2, o2, stats = jax.jit(ts.train_step)(
        params, opt_state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(stats["loss"]))


def test_train_step_deterministic():
    """Same seed + same batch -> bitwise-identical params after 2 steps
    (deterministic resume is the failure-recovery contract, SURVEY.md §5.3)."""
    _tiny_train_cfg()

    def run():
        params = mb.init_model(jax.random.PRNGKey(0))
        opt_state = opt.init_opt_state(params)
        batch = _tiny_batch()
        step = jax.jit(ts.train_step)
        for i in range(2):
            params, opt_state, _ = step(
                params, opt_state, batch,
                jax.random.fold_in(jax.random.PRNGKey(5), i))
        return params

    p1 = run()
    p2 = run()
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        p1, p2)


def test_affine_and_frozen_stages_do_not_train():
    """The reference freezes every AffineChannel2d and all FREEZE_AT<=N
    stages (requires_grad=False => excluded from the optimizer, so no LR and
    no weight decay). After a train step: all body *_bn leaves and the
    stem/res2 convs are bit-identical; res4 convs and head params moved."""
    _tiny_train_cfg()
    config.merge_cfg_from_list(["RESNETS.FREEZE_AT", "2",
                                "SOLVER.WEIGHT_DECAY", "0.01"])
    params = mb.init_model(jax.random.PRNGKey(0))
    opt_state = opt.init_opt_state(params)
    batch = _tiny_batch()
    # Fresh lambda: jit traces are cached per function object, and cfg is
    # baked in at trace time — reusing ts.train_step would replay a trace
    # from an earlier test's cfg.
    p2, _, _ = jax.jit(lambda *a: ts.train_step(*a))(
        params, opt_state, batch, jax.random.PRNGKey(1))

    def leaves_equal(a, b):
        return all(np.array_equal(np.asarray(x), np.asarray(y))
                   for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)))

    # Every affine (frozen BN) leaf in the body is untouched.
    for stage in ("res2", "res3", "res4", "res5"):
        for blk_old, blk_new in zip(params["body"][stage],
                                    p2["body"][stage]):
            for k in blk_old:
                if k.endswith("_bn"):
                    assert leaves_equal(blk_old[k], blk_new[k]), (stage, k)
    assert leaves_equal(params["body"]["res_conv1_bn"],
                        p2["body"]["res_conv1_bn"])
    # FREEZE_AT=2: stem + res2 convs untouched (incl. no weight decay).
    assert leaves_equal(params["body"]["conv1"], p2["body"]["conv1"])
    assert leaves_equal(params["body"]["res2"], p2["body"]["res2"])
    # Trainable parts moved.
    assert not leaves_equal(params["body"]["res4"], p2["body"]["res4"])
    assert not leaves_equal(params["box_outs"], p2["box_outs"])


def test_gn_params_train_when_use_gn():
    """With RESNETS.USE_GN the *_bn params are GroupNorm scale/bias: they
    must train (above FREEZE_AT) — freezing applies only to affine."""
    _tiny_train_cfg()
    config.merge_cfg_from_list([
        "RESNETS.USE_GN", "True", "RESNETS.FREEZE_AT", "2"])
    params = mb.init_model(jax.random.PRNGKey(0))
    opt_state = opt.init_opt_state(params)
    batch = _tiny_batch()
    p2, _, _ = jax.jit(lambda *a: ts.train_step(*a))(
        params, opt_state, batch, jax.random.PRNGKey(1))
    moved = 0
    for blk_old, blk_new in zip(params["body"]["res4"], p2["body"]["res4"]):
        for k in blk_old:
            if k.endswith("_bn"):
                for x, y in zip(jax.tree.leaves(blk_old[k]),
                                jax.tree.leaves(blk_new[k])):
                    if not np.array_equal(np.asarray(x), np.asarray(y)):
                        moved += 1
    assert moved > 0
    config.merge_cfg_from_list(["RESNETS.USE_GN", "False"])


def test_grad_accumulation_equivalent_to_averaged_microbatch_grads():
    """The --iter_size contract, proven: one accumulating step over k
    stacked microbatches must equal ONE optimizer update on the AVERAGE of
    the k per-microbatch gradients (each computed with the step's own
    fold_in(rng, i) — the exact big-batch-gradient semantics of the
    reference's inner iter_size loop). A missing /iter_size (2x grads) or a
    dropped microbatch fails this within two updates."""
    from detectron_tpu.models import train_graph

    _tiny_train_cfg()
    mesh = mesh_mod.make_mesh(1)
    params = mb.init_model(jax.random.PRNGKey(0))
    opt_state = opt.init_opt_state(params)
    b0 = _tiny_batch()
    # Distinct microbatches: perturb the image so grads differ.
    b1 = dict(b0)
    b1["images"] = b0["images"] + 0.5
    stacked = jax.tree.map(lambda x, y: jnp.stack([x, y]), b0, b1)

    # Reference: explicit averaged-gradient updates (2 of them).
    @jax.jit
    def manual_step(p, o, rng):
        def gfn(pp, bb, rr):
            total, _ = train_graph.training_losses(pp, bb, rr)
            return total
        g0 = jax.grad(gfn)(p, b0, jax.random.fold_in(rng, 0))
        g1 = jax.grad(gfn)(p, b1, jax.random.fold_in(rng, 1))
        gavg = jax.tree.map(lambda a, c: (a + c) / 2.0, g0, g1)
        return opt.apply_updates(p, gavg, o)[:2]

    p_ref, o_ref = params, opt_state
    for it in range(2):
        p_ref, o_ref = manual_step(p_ref, o_ref,
                                   jax.random.PRNGKey(100 + it))

    with mesh:
        step = ts.make_pjit_train_step_accum(mesh, iter_size=2,
                                             donate=False)
        p2, o2 = params, opt_state
        for it in range(2):
            p2, o2, stats = step(p2, o2, stacked,
                                 jax.random.PRNGKey(100 + it))
    for k, v in stats.items():
        assert np.isfinite(np.asarray(v)).all(), k
    assert int(np.asarray(o2["step"])) == 2

    flat_ref = jax.tree.leaves(p_ref)
    flat_acc = jax.tree.leaves(p2)
    for a, c in zip(flat_ref, flat_acc):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(c, np.float32),
                                   rtol=2e-5, atol=2e-6)


def test_fast_rcnn_mode_training_from_proposals():
    """Fast R-CNN mode (TRAIN.PROPOSAL_FILES, RPN off): trains from
    precomputed proposals — no RPN params, no RPN losses, loss decreases on
    a fixed batch (reference: lib/roi_data/minibatch.py non-RPN branch)."""
    _tiny_train_cfg()
    config.merge_cfg_from_list([
        "MODEL.FASTER_RCNN", "False",
        "TPU.MAX_TRAIN_PROPOSALS", "32",
        "SOLVER.BASE_LR", "0.0005",
        "SOLVER.WARM_UP_ITERS", "0",
        "SOLVER.STEPS", "[0]",
    ])
    cfg.RPN.RPN_ON = False
    try:
        params = mb.init_model(jax.random.PRNGKey(0))
        assert "rpn" not in params
        opt_state = opt.init_opt_state(params)
        batch = _tiny_batch()
        R = 32
        props = np.zeros((2, R, 4), np.float32)
        rng0 = np.random.RandomState(3)
        # proposals: jittered copies of the two gt boxes + random negatives
        base = np.array([[4, 4, 30, 30], [20, 20, 60, 60]], np.float32)
        for b in range(2):
            for r in range(R):
                if r < 16:
                    props[b, r] = base[r % 2] + rng0.uniform(-3, 3, 4)
                else:
                    x1, y1 = rng0.uniform(0, 40, 2)
                    props[b, r] = [x1, y1, x1 + rng0.uniform(5, 20),
                                   y1 + rng0.uniform(5, 20)]
        batch["proposals"] = jnp.asarray(np.clip(props, 0, 63))
        batch["prop_valid"] = jnp.ones((2, R), bool)

        step = jax.jit(lambda *a: ts.train_step(*a))
        losses = []
        for i in range(6):
            params, opt_state, stats = step(
                params, opt_state, batch,
                jax.random.fold_in(jax.random.PRNGKey(7), i))
            assert "loss_rpn_cls" not in stats
            assert np.isfinite(float(stats["loss"]))
            losses.append(float(stats["loss_cls"]))
        assert losses[-1] < losses[0], losses
    finally:
        config.merge_cfg_from_list(["MODEL.FASTER_RCNN", "True"])
        cfg.RPN.RPN_ON = True


def test_train_step_with_pallas_roi_impl():
    """Training with TPU.ROI_IMPL=pallas (kernel forward + custom_vjp
    backward) runs end-to-end and moves the head params."""
    _tiny_train_cfg()
    config.merge_cfg_from_list(["TPU.ROI_IMPL", "pallas",
                                "TPU.ROI_WINDOW", "16"])
    try:
        params = mb.init_model(jax.random.PRNGKey(0))
        opt_state = opt.init_opt_state(params)
        batch = _tiny_batch()
        p2, _, stats = jax.jit(lambda *a: ts.train_step(*a))(
            params, opt_state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(stats["loss"]))
        assert not all(
            np.array_equal(np.asarray(x), np.asarray(y))
            for x, y in zip(jax.tree.leaves(params["box_head"]),
                            jax.tree.leaves(p2["box_head"])))
    finally:
        config.merge_cfg_from_list(["TPU.ROI_IMPL", "pallas"])
