"""get_func dotted-name head registry (reference:
lib/modeling/model_builder.py :: get_func — the reference's extension
mechanism: a head is selected purely by config string, and a NEW head needs
no model_builder edits)."""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detectron_tpu.core import config
from detectron_tpu.core.config import cfg
from detectron_tpu.models import model_builder as mb
from detectron_tpu.models import registry


SHIPPED = [
    "fast_rcnn_heads.roi_2mlp_head",
    "fast_rcnn_heads.roi_Xconv1fc_head",
    "fast_rcnn_heads.roi_Xconv1fc_gn_head",
    "ResNet.ResNet_roi_conv5_head",
    "mask_rcnn_heads.mask_rcnn_fcn_head_v1up4convs",
    "mask_rcnn_heads.mask_rcnn_fcn_head_v1up4convs_gn",
    "mask_rcnn_heads.mask_rcnn_fcn_head_v1up",
    "mask_rcnn_heads.mask_rcnn_fcn_head_v0up",
    "mask_rcnn_heads.mask_rcnn_fcn_head_v0upshare",
    "keypoint_rcnn_heads.roi_pose_head_v1convX",
]


def test_all_shipped_names_resolve():
    for name in SHIPPED:
        h = registry.get_func(name)
        assert callable(h.init) and callable(h.apply), name
        assert isinstance(h.out_dim(), int), name


def test_unknown_name_raises_reference_error():
    with pytest.raises(ValueError, match="Failed to find function"):
        registry.get_func("fast_rcnn_heads.no_such_head")
    with pytest.raises(ValueError, match="Failed to find function"):
        registry.get_func("no_such_module.some_head")
    assert registry.get_func("") is None


def test_new_head_via_convention_no_model_builder_edit():
    """A brand-new head: a module with init_<name>/apply_<name> (+ optional
    out_dim_<name>) resolves and BUILDS through init_model/forward with only
    a config change — the reference's plugin contract."""
    modname = "detectron_tpu.models.my_plugin_heads"
    mod = types.ModuleType(modname)

    def init_tiny_avg_head(rng, dim_in, roi_res):
        k = jax.random.normal(rng, (dim_in, 24)) * 0.01
        return {"w": k}

    def apply_tiny_avg_head(p, roi_feat):
        # (N, P, P, C) -> global average pool -> FC
        pooled = roi_feat.mean(axis=(1, 2))
        return jnp.maximum(pooled.astype(p["w"].dtype) @ p["w"], 0.0)

    mod.init_tiny_avg_head = init_tiny_avg_head
    mod.apply_tiny_avg_head = apply_tiny_avg_head
    mod.out_dim_tiny_avg_head = 24
    sys.modules[modname] = mod
    try:
        h = registry.get_func("my_plugin_heads.tiny_avg_head")
        assert h.out_dim() == 24
        p = h.init(jax.random.PRNGKey(0), 256, 7)
        out = h.apply(p, jnp.ones((4, 7, 7, 256)))
        assert out.shape == (4, 24)

        # End-to-end: init_model + forward_box_outputs with the new head
        # selected purely by config.
        from tests.test_train_step import _tiny_train_cfg

        _tiny_train_cfg()
        config.merge_cfg_from_list(
            ["FAST_RCNN.ROI_BOX_HEAD", "my_plugin_heads.tiny_avg_head"])
        try:
            params = mb.init_model(jax.random.PRNGKey(0))
            assert params["box_outs"]["cls_score"]["w"].shape[0] == 24
            feats = [jnp.ones((1, 32, 32, 256)) * 0.1,
                     jnp.ones((1, 16, 16, 256)) * 0.1,
                     jnp.ones((1, 8, 8, 256)) * 0.1,
                     jnp.ones((1, 4, 4, 256)) * 0.1]
            rois = jnp.asarray([[[4.0, 4.0, 60.0, 40.0]] * 8], jnp.float32)
            scales = (0.25, 0.125, 0.0625, 0.03125)
            cls, box, _ = mb.forward_box_outputs(
                params, feats, scales, rois, impl="gather")
            assert np.isfinite(np.asarray(cls)).all()
        finally:
            config.merge_cfg_from_list(
                ["FAST_RCNN.ROI_BOX_HEAD", "fast_rcnn_heads.roi_2mlp_head"])
    finally:
        del sys.modules[modname]
