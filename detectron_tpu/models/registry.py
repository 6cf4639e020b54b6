"""Dotted-name -> function resolution for bodies and heads.

Reference parity: lib/modeling/model_builder.py :: get_func resolves config
strings like 'fast_rcnn_heads.roi_2mlp_head' by importing the named module
under lib/modeling and fetching the attribute — it is the reference's plugin
mechanism: a brand-new head works by defining the function, with zero edits
to model_builder. This rebuild's heads are functional (init, apply) pairs,
so a name resolves to a HeadFuncs record:

  init(rng, dim_in[, roi_res]) -> params        (pytree)
  apply(params, roi_feat, **kw) -> features     (pure, jit-safe)
  out_dim() -> int                              (feature dim for the outputs)

Resolution order:
  1. the explicit registration table (every shipped reference head name);
  2. convention fallback: 'module.symbol' imports detectron_tpu.models.module
     (aliases: FPN -> fpn, ResNet -> resnet) and looks up 'init_<symbol>' /
     'apply_<symbol>' (+ optional 'out_dim_<symbol>'), so a new head needs
     only those two functions next to the shipped ones — no model_builder
     edits, matching the reference's extension contract.
Unknown names raise ValueError('Failed to find function: <name>') — the
reference's error surface.
"""

import functools
import importlib
import inspect

from detectron_tpu.core.config import cfg


class HeadFuncs:
    """Resolved (init, apply) pair + metadata."""

    def __init__(self, init, apply, out_dim=None, supports_qp=False):
        self.init = init
        self.apply = apply
        self.out_dim = out_dim or (lambda: cfg.FAST_RCNN.MLP_HEAD_DIM)
        # apply() accepts qp_order= (the pallas (q, p) pooled-layout
        # optimization is absorbed by the head's first FC): only heads that
        # flatten the full pooled block can.
        self.supports_qp = supports_qp


_REGISTRY = {}

_MODULE_ALIASES = {"FPN": "fpn", "ResNet": "resnet"}


def register(name, **kw):
    """Explicitly register a head under its reference dotted name."""

    def deco(make):
        _REGISTRY[name] = (make, kw)
        return make

    return deco


def register_head(name, init, apply, **kw):
    _REGISTRY[name] = ((lambda: HeadFuncs(init, apply, **kw)), {})


def _adapt_init(fn):
    """Call fn with as many of (rng, dim_in, roi_res) as it accepts —
    shipped heads vary (mask heads take no roi_res)."""
    try:
        n = len([p for p in inspect.signature(fn).parameters.values()
                 if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)])
    except (TypeError, ValueError):
        n = 3

    def init(rng, dim_in, roi_res=None):
        args = (rng, dim_in, roi_res)[:n]
        return fn(*args)

    return init


def get_func(func_name):
    """Resolve a config head name to HeadFuncs (reference:
    model_builder.get_func). Empty name -> None."""
    if not func_name:
        return None
    if func_name in _REGISTRY:
        make, kw = _REGISTRY[func_name]
        return make(**kw) if kw else make()
    try:
        mod_name, sym = func_name.rsplit(".", 1)
        mod = importlib.import_module(
            "detectron_tpu.models." +
            _MODULE_ALIASES.get(mod_name, mod_name))
        init = getattr(mod, "init_" + sym)
        apply = getattr(mod, "apply_" + sym)
    except (ValueError, ImportError, AttributeError):
        raise ValueError("Failed to find function: %s" % func_name)
    out_dim = getattr(mod, "out_dim_" + sym, None)
    if out_dim is not None and not callable(out_dim):
        out_dim = functools.partial(int, out_dim)
    return HeadFuncs(_adapt_init(init), apply, out_dim=out_dim)


# ---------------------------------------------------------------------------
# Shipped reference head names (lib/modeling/* function names)
# ---------------------------------------------------------------------------

@register("fast_rcnn_heads.roi_2mlp_head")
def _roi_2mlp():
    from detectron_tpu.models import fast_rcnn_heads as f

    return HeadFuncs(
        lambda rng, dim_in, roi_res: f.init_roi_2mlp_head(
            rng, dim_in, roi_res),
        f.apply_roi_2mlp_head, supports_qp=True)


@register("fast_rcnn_heads.roi_Xconv1fc_head", use_gn=False)
@register("fast_rcnn_heads.roi_Xconv1fc_gn_head", use_gn=True)
def _roi_xconv(use_gn):
    from detectron_tpu.models import fast_rcnn_heads as f

    return HeadFuncs(
        lambda rng, dim_in, roi_res: f.init_roi_Xconv1fc_head(
            rng, dim_in, roi_res, use_gn=use_gn),
        f.apply_roi_Xconv1fc_head)


@register("ResNet.ResNet_roi_conv5_head")
def _roi_conv5():
    from detectron_tpu.models import resnet

    return HeadFuncs(
        lambda rng, dim_in, roi_res=None: resnet.init_roi_conv5_head(
            rng, dim_in),
        resnet.apply_roi_conv5_head, out_dim=lambda: 2048)


def _register_mask(name):
    @register("mask_rcnn_heads." + name, head_name=name)
    def _mk(head_name):
        from detectron_tpu.models import mask_rcnn_heads as m

        return HeadFuncs(
            lambda rng, dim_in, roi_res=None: m.init_mask_head(
                rng, dim_in, head_name=head_name),
            m.apply_mask_head, out_dim=lambda: cfg.MRCNN.DIM_REDUCED)


for _n in ("mask_rcnn_fcn_head_v1up4convs", "mask_rcnn_fcn_head_v1up4convs_gn",
           "mask_rcnn_fcn_head_v1up", "mask_rcnn_fcn_head_v0up",
           "mask_rcnn_fcn_head_v0upshare"):
    _register_mask(_n)


@register("keypoint_rcnn_heads.roi_pose_head_v1convX")
def _pose_v1convx():
    from detectron_tpu.models import keypoint_rcnn_heads as k

    return HeadFuncs(
        lambda rng, dim_in, roi_res=None: k.init_pose_head(rng, dim_in),
        k.apply_pose_head, out_dim=lambda: cfg.KRCNN.CONV_HEAD_DIM)
