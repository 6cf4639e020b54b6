"""SGD with momentum, Detectron parameter-group rules, and the stepwise LR
schedule — all as pure jnp (runs inside the pjit'd train step).

Semantics notes (for parity with the reference):
- The reference uses torch SGD (v = mu*v + g_total; w -= lr*v) plus a
  momentum-buffer rescale on LR changes (lib/utils/net.py ::
  update_learning_rate, SOLVER.SCALE_MOMENTUM) to emulate Caffe2. We
  implement the Caffe2 form directly: v = mu*v + lr*(g + wd*w); w -= v.
  The two are equivalent given the rescale trick, without needing it.
- Param groups (tools/train_net_step.py): biases get 2x LR
  (SOLVER.BIAS_DOUBLE_LR) and no weight decay unless
  SOLVER.BIAS_WEIGHT_DECAY; GroupNorm scale/bias get SOLVER.WEIGHT_DECAY_GN.
- LR schedule (lib/utils/lr_policy equivalent): warm-up (constant|linear)
  for WARM_UP_ITERS, then steps_with_decay over SOLVER.STEPS with GAMMA.
"""

import jax
import jax.numpy as jnp

from detectron_tpu.core.config import cfg


def _param_kind(path):
    """Classify a pytree path: 'bias' | 'gn' | 'affine' | 'weight'.

    '*_bn' params are the body's norm layers: AffineChannel (frozen BN —
    reference freezes ALL AffineChannel2d params, so kind 'affine' gets
    lr 0 / wd 0) unless RESNETS.USE_GN, in which case they are GroupNorm
    scale/bias (kind 'gn', SOLVER.WEIGHT_DECAY_GN).
    """
    keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
    keys = [k for k in keys if isinstance(k, str)]
    # Frozen body stages (RESNETS.FREEZE_AT / TRAIN.FREEZE_CONV_BODY): the
    # reference drops requires_grad=False params from the optimizer, so they
    # see neither LR nor weight decay. stop_gradient in apply_body zeroes
    # their grads; this keeps weight decay off them too.
    if keys and keys[0] in ("body", "fpn") and cfg.TRAIN.FREEZE_CONV_BODY:
        return "frozen"
    if keys and keys[0] == "body":
        fa = cfg.RESNETS.FREEZE_AT
        if fa >= 2 and len(keys) > 1:
            sub = keys[1]
            if sub in ("conv1", "res_conv1_bn"):
                return "frozen"
            if sub.startswith("res") and sub[3:].isdigit() \
                    and int(sub[3:]) <= fa:
                return "frozen"
    if any(k.endswith("_bn") for k in keys):
        return "gn" if cfg.RESNETS.USE_GN else "affine"
    if any(k.endswith("_gn") or k == "gns" for k in keys):
        return "gn"
    if keys and keys[-1] == "b":
        return "bias"
    return "weight"


def make_lr_fn():
    """step (int32) -> lr (float32), pure jnp."""
    base_lr = cfg.SOLVER.BASE_LR
    gamma = cfg.SOLVER.GAMMA
    steps = tuple(cfg.SOLVER.STEPS) or (0,)
    warm_iters = cfg.SOLVER.WARM_UP_ITERS
    warm_factor = cfg.SOLVER.WARM_UP_FACTOR
    warm_method = cfg.SOLVER.WARM_UP_METHOD
    policy = cfg.SOLVER.LR_POLICY

    def lr_fn(step):
        step_f = step.astype(jnp.float32)
        if policy in ("steps_with_decay", "step"):
            if policy == "steps_with_decay":
                n_decays = sum(
                    ((step >= s).astype(jnp.int32) for s in steps if s > 0),
                    jnp.int32(0))
            else:
                n_decays = step // cfg.SOLVER.STEP_SIZE
            lr = base_lr * (gamma ** jnp.asarray(n_decays, jnp.float32))
        else:
            lr = jnp.float32(base_lr)
        if warm_iters > 0:
            if warm_method == "linear":
                alpha = step_f / warm_iters
                factor = warm_factor * (1.0 - alpha) + alpha
            else:  # constant
                factor = jnp.float32(warm_factor)
            lr = jnp.where(step < warm_iters, lr * factor, lr)
        return lr

    return lr_fn


def init_opt_state(params):
    return {
        "momentum": jax.tree.map(jnp.zeros_like, params),
        "step": jnp.zeros((), jnp.int32),
    }


def apply_updates(params, grads, opt_state):
    """One Caffe2-style SGD+momentum step with Detectron group rules."""
    if cfg.SOLVER.CLIP_GRADIENTS > 0:
        gnorm = jnp.sqrt(sum(
            jnp.sum(jnp.square(g.astype(jnp.float32)))
            for g in jax.tree.leaves(grads)))
        scale = jnp.minimum(1.0, cfg.SOLVER.CLIP_GRADIENTS /
                            jnp.maximum(gnorm, 1e-12))
        grads = jax.tree.map(lambda g: g * scale, grads)
    lr_fn = make_lr_fn()
    lr = lr_fn(opt_state["step"])
    # Momentum correction at lr boundaries (reference: utils/net.py ::
    # update_learning_rate -> Detectron's _CorrectMomentum): the Caffe2-form
    # momentum buffer carries lr inside it, so when the schedule jumps
    # (STEPS decay; NOT the per-step warmup ramp, which stays inside the
    # threshold) the buffered history must be rescaled by new_lr/old_lr.
    if cfg.SOLVER.SCALE_MOMENTUM:
        lr_prev = lr_fn(jnp.maximum(opt_state["step"] - 1, 0))
        ratio = lr / jnp.maximum(lr_prev, 1e-20)
        thr = cfg.SOLVER.SCALE_MOMENTUM_THRESHOLD
        mcorr = jnp.where((ratio > thr) | (ratio < 1.0 / thr), ratio, 1.0)
    else:
        mcorr = jnp.float32(1.0)
    mu = cfg.SOLVER.MOMENTUM
    wd = cfg.SOLVER.WEIGHT_DECAY
    wd_gn = cfg.SOLVER.WEIGHT_DECAY_GN
    bias_lr_mult = 2.0 if cfg.SOLVER.BIAS_DOUBLE_LR else 1.0
    bias_wd = wd if cfg.SOLVER.BIAS_WEIGHT_DECAY else 0.0

    def upd(path, p, g, v):
        kind = _param_kind(path)
        if kind in ("affine", "frozen"):
            # Frozen params: never updated (reference requires_grad=False on
            # every AffineChannel2d and on FREEZE_AT stages — excluded from
            # the optimizer's param groups entirely).
            return p, v
        if kind == "bias":
            eff_lr, eff_wd = lr * bias_lr_mult, bias_wd
        elif kind == "gn":
            eff_lr, eff_wd = lr, wd_gn
        else:
            eff_lr, eff_wd = lr, wd
        g32 = g.astype(jnp.float32)
        v_new = mu * (mcorr * v) + eff_lr * (g32 + eff_wd * p)
        return p - v_new, v_new

    flat = jax.tree_util.tree_map_with_path(
        lambda path, p, g, v: upd(path, p, g, v),
        params, grads, opt_state["momentum"])
    new_params = jax.tree.map(lambda t: t[0], flat,
                              is_leaf=lambda t: isinstance(t, tuple))
    new_momentum = jax.tree.map(lambda t: t[1], flat,
                                is_leaf=lambda t: isinstance(t, tuple))
    return new_params, {
        "momentum": new_momentum,
        "step": opt_state["step"] + 1,
    }, lr
