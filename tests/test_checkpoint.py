import numpy as np
import jax
import jax.numpy as jnp

from detectron_tpu.core import config
from detectron_tpu.utils import net as net_utils


def _params():
    return {
        "body": {"conv1": {"w": jnp.ones((3, 3, 3, 8))},
                 "res2": [{"branch2a": {"w": jnp.full((1, 1, 8, 8), 2.0)}},
                          {"branch2a": {"w": jnp.full((1, 1, 8, 8), 3.0)}}]},
        "box_outs": {"cls_score": {"w": jnp.zeros((8, 4)),
                                   "b": jnp.arange(4.0)}},
    }


def test_ckpt_roundtrip(tmp_path):
    params = _params()
    opt_state = {"momentum": jax.tree.map(jnp.zeros_like, params),
                 "step": jnp.asarray(123, jnp.int32)}
    ckpt_dir = net_utils.save_ckpt(str(tmp_path), 123, params, opt_state,
                                   meta={"train_size": 1000})
    step, payload = net_utils.load_ckpt(ckpt_dir)
    assert step == 123
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        params, payload["params"])
    # list-structured subtrees survive (res2 blocks)
    assert isinstance(payload["params"]["body"]["res2"], list)
    assert len(payload["params"]["body"]["res2"]) == 2
    np.testing.assert_array_equal(
        np.asarray(payload["opt_state"]["step"]), 123)


def test_ckpt_params_only_load(tmp_path):
    params = _params()
    ckpt_dir = net_utils.save_ckpt(str(tmp_path), 7, params)
    loaded = net_utils.load_ckpt_params(ckpt_dir)
    np.testing.assert_array_equal(
        np.asarray(loaded["box_outs"]["cls_score"]["b"]),
        np.arange(4.0))
