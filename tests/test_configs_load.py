"""Every shipped yaml config must merge cleanly and pass
assert_and_infer_cfg, and the model must build from it."""

import glob
import os

import pytest

from detectron_tpu.core import config
from detectron_tpu.core.config import cfg

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ALL_CONFIGS = sorted(glob.glob(os.path.join(REPO, "configs", "**", "*.yaml"),
                               recursive=True))


def test_configs_exist():
    assert len(ALL_CONFIGS) >= 25


@pytest.mark.parametrize("path", ALL_CONFIGS,
                         ids=[os.path.basename(p) for p in ALL_CONFIGS])
def test_config_merges(path):
    config.merge_cfg_from_file(path)
    config.assert_and_infer_cfg(make_immutable=False)
    assert cfg.MODEL.NUM_CLASSES > 0
    assert cfg.MODEL.CONV_BODY


def test_build_model_from_c4_config():
    import jax

    from detectron_tpu.models import model_builder as mb

    config.merge_cfg_from_file(os.path.join(
        REPO, "configs", "baselines", "e2e_faster_rcnn_R-50-C4_1x.yaml"))
    config.assert_and_infer_cfg(make_immutable=False)
    params = mb.init_model(jax.random.PRNGKey(0))
    assert "res5" in params["box_head"]
    assert params["body"]["conv1"]["w"].shape == (7, 7, 3, 64)


def test_build_model_from_gn_config():
    import jax

    from detectron_tpu.models import model_builder as mb

    config.merge_cfg_from_file(os.path.join(
        REPO, "configs", "gn_baselines", "e2e_mask_rcnn_R-50-FPN_1x_gn.yaml"))
    config.assert_and_infer_cfg(make_immutable=False)
    params = mb.init_model(jax.random.PRNGKey(0))
    assert "gns" in params["box_head"]
    assert "gns" in params["mask_head"]


def test_build_resnext_config():
    import jax

    from detectron_tpu.models import model_builder as mb

    config.merge_cfg_from_file(os.path.join(
        REPO, "configs", "baselines", "e2e_mask_rcnn_X-101-32x8d-FPN_1x.yaml"))
    config.assert_and_infer_cfg(make_immutable=False)
    params = mb.init_model(jax.random.PRNGKey(0))
    # ResNeXt 32x8d: res2 inner dim = 32*8 = 256, grouped 3x3 kernels have
    # in_c/groups = 256/32 = 8
    w = params["body"]["res2"][0]["branch2b"]["w"]
    assert w.shape == (3, 3, 8, 256)
