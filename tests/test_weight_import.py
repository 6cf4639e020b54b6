"""Lock the Caffe2->JAX weight layout conventions against torch (the
reference's runtime), and check mapping-table coverage of the param tree."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from detectron_tpu.core import config
from detectron_tpu.models import layers as L
from detectron_tpu.utils import detectron_weight_helper as dwh


def test_conv_import_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    w_oihw = rng.randn(6, 3, 3, 3).astype(np.float32)
    b = rng.randn(6).astype(np.float32)
    x = rng.randn(1, 8, 8, 3).astype(np.float32)

    ref = F.conv2d(torch.tensor(x.transpose(0, 3, 1, 2)),
                   torch.tensor(w_oihw), torch.tensor(b), stride=1,
                   padding=1).numpy().transpose(0, 2, 3, 1)

    p = {"w": jnp.asarray(dwh._conv(w_oihw)), "b": jnp.asarray(b)}
    out = np.asarray(L.conv2d(p, jnp.asarray(x), stride=1, padding=1))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_strided_conv_import_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(1)
    w = rng.randn(4, 3, 7, 7).astype(np.float32)
    x = rng.randn(1, 16, 16, 3).astype(np.float32)
    ref = F.conv2d(torch.tensor(x.transpose(0, 3, 1, 2)), torch.tensor(w),
                   stride=2, padding=3).numpy().transpose(0, 2, 3, 1)
    p = {"w": jnp.asarray(dwh._conv(w))}
    out = np.asarray(L.conv2d(p, jnp.asarray(x), stride=2, padding=3))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_grouped_conv_import_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(2)
    groups = 4
    w = rng.randn(8, 2, 3, 3).astype(np.float32)  # (O, I/g, kh, kw)
    x = rng.randn(1, 6, 6, 8).astype(np.float32)
    ref = F.conv2d(torch.tensor(x.transpose(0, 3, 1, 2)), torch.tensor(w),
                   stride=1, padding=1, groups=groups
                   ).numpy().transpose(0, 2, 3, 1)
    p = {"w": jnp.asarray(dwh._conv(w))}
    out = np.asarray(
        L.conv2d(p, jnp.asarray(x), stride=1, padding=1, groups=groups))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k,s,p", [(2, 2, 0), (4, 2, 1)])
def test_deconv_import_matches_torch(k, s, p):
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(3)
    w_iohw = rng.randn(5, 7, k, k).astype(np.float32)  # (in, out, kh, kw)
    b = rng.randn(7).astype(np.float32)
    x = rng.randn(1, 6, 6, 5).astype(np.float32)
    ref = F.conv_transpose2d(
        torch.tensor(x.transpose(0, 3, 1, 2)), torch.tensor(w_iohw),
        torch.tensor(b), stride=s, padding=p
    ).numpy().transpose(0, 2, 3, 1)

    pd = {"w": jnp.asarray(dwh._deconv(w_iohw)), "b": jnp.asarray(b)}
    out = np.asarray(L.conv_transpose2d(pd, jnp.asarray(x), stride=s,
                                        torch_padding=p))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_fc_import_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(4)
    w = rng.randn(10, 6).astype(np.float32)  # (out, in)
    b = rng.randn(10).astype(np.float32)
    x = rng.randn(3, 6).astype(np.float32)
    ref = F.linear(torch.tensor(x), torch.tensor(w),
                   torch.tensor(b)).numpy()
    p = {"w": jnp.asarray(dwh._fc(w)), "b": jnp.asarray(b)}
    out = np.asarray(L.fc(p, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def _leaf_paths(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _leaf_paths(v, prefix + (k,))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _leaf_paths(v, prefix + (i,))
    else:
        yield prefix


def test_mapping_covers_all_params_mask_rcnn_fpn():
    from detectron_tpu.core.configs_presets import mask_rcnn_r50_fpn
    from detectron_tpu.models import model_builder as mb

    mask_rcnn_r50_fpn(num_classes=81)
    config.assert_and_infer_cfg(make_immutable=False)
    params = mb.init_model(jax.random.PRNGKey(0))
    mapping = dwh.full_weight_mapping()

    mapped_paths = {tuple(path) for path, _ in mapping.values()}
    all_paths = set(_leaf_paths(params))
    unmapped = all_paths - mapped_paths
    assert not unmapped, "Params without a Detectron blob: {}".format(
        sorted(unmapped)[:10])
    # And every mapped path must exist with a matching leaf.
    bogus = mapped_paths - all_paths
    assert not bogus, "Mapping points at nonexistent params: {}".format(
        sorted(bogus)[:10])


def test_load_detectron_pkl_roundtrip(tmp_path):
    """Synthesize a Detectron-format pkl for the tiny FPN model and load it."""
    import pickle

    from detectron_tpu.core.configs_presets import mask_rcnn_r50_fpn
    from detectron_tpu.models import model_builder as mb

    mask_rcnn_r50_fpn(num_classes=81)
    config.assert_and_infer_cfg(make_immutable=False)
    params = mb.init_model(jax.random.PRNGKey(0))
    mapping = dwh.full_weight_mapping()

    # Build blobs with the right Caffe2 layouts by inverting the transforms.
    rng = np.random.RandomState(0)
    blobs = {}
    for name, (path, transform) in mapping.items():
        node = params
        for p in path:
            node = node[p]
        shape = np.asarray(node).shape
        if transform is dwh._conv:
            blob = rng.randn(shape[3], shape[2], shape[0], shape[1])
        elif transform is dwh._deconv:
            blob = rng.randn(shape[2], shape[3], shape[0], shape[1])
        elif transform is dwh._fc:
            blob = rng.randn(shape[1], shape[0])
        else:
            blob = rng.randn(*shape)
        blobs[name] = blob.astype(np.float32)
    pkl = tmp_path / "model_final.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({"blobs": blobs}, f)

    params = dwh.load_detectron_weight(params, str(pkl))
    # Spot-check a conv and a fc imported with the expected transform.
    np.testing.assert_allclose(
        np.asarray(params["body"]["conv1"]["w"]),
        dwh._conv(blobs["conv1_w"]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(params["box_outs"]["cls_score"]["w"]),
        dwh._fc(blobs["cls_score_w"]), rtol=1e-6)


def test_imagenet_resnet_state_dict_import():
    """Synthetic torchvision-style ResNet-50 state dict (with BN running
    stats) folds into the body params correctly."""
    import jax

    from detectron_tpu.core.configs_presets import mask_rcnn_r50_fpn
    from detectron_tpu.models import model_builder as mb
    from detectron_tpu.utils import resnet_weights_helper as rwh

    mask_rcnn_r50_fpn(num_classes=4)
    config.assert_and_infer_cfg(make_immutable=False)
    params = mb.init_model(jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    sd = {"conv1.weight": rng.randn(64, 3, 7, 7).astype(np.float32)}
    for n in ("weight", "bias", "running_mean", "running_var"):
        v = rng.rand(64).astype(np.float32) + 0.5
        sd["bn1." + n] = v
    counts = {1: 3, 2: 4, 3: 6, 4: 3}
    dims = {1: (64, 256), 2: (128, 512), 3: (256, 1024), 4: (512, 2048)}
    for li, n_blocks in counts.items():
        inner, outer = dims[li]
        in_c = 64 if li == 1 else dims[li - 1][1]
        for b in range(n_blocks):
            pre = "layer{}.{}.".format(li, b)
            cin = in_c if b == 0 else outer
            sd[pre + "conv1.weight"] = rng.randn(
                inner, cin, 1, 1).astype(np.float32)
            sd[pre + "conv2.weight"] = rng.randn(
                inner, inner, 3, 3).astype(np.float32)
            sd[pre + "conv3.weight"] = rng.randn(
                outer, inner, 1, 1).astype(np.float32)
            for bi, ch in (("bn1", inner), ("bn2", inner), ("bn3", outer)):
                for n in ("weight", "bias", "running_mean", "running_var"):
                    sd[pre + bi + "." + n] = (
                        rng.rand(ch).astype(np.float32) + 0.5)
            if b == 0:
                sd[pre + "downsample.0.weight"] = rng.randn(
                    outer, cin, 1, 1).astype(np.float32)
                for n in ("weight", "bias", "running_mean", "running_var"):
                    sd[pre + "downsample.1." + n] = (
                        rng.rand(outer).astype(np.float32) + 0.5)

    updates = rwh.convert_state_dict(sd, 50, 4)
    # conv1 transposed to HWIO
    np.testing.assert_allclose(
        updates[("body", "conv1", "w")],
        np.transpose(sd["conv1.weight"], (2, 3, 1, 0)))
    # BN folded: s = gamma/sqrt(var+eps)
    s = updates[("body", "res_conv1_bn", "s")]
    np.testing.assert_allclose(
        s, sd["bn1.weight"] / np.sqrt(sd["bn1.running_var"] + 1e-5),
        rtol=1e-6)
    # every update path exists in the model with matching shape
    for path, val in updates.items():
        node = params
        for pp in path:
            node = node[pp]
        assert tuple(np.asarray(node).shape) == tuple(val.shape), path


def test_convert_detectron_pkl_cli(tmp_path):
    """The conversion CLI maps a synthetic pkl and writes a loadable ckpt."""
    import pickle
    import subprocess
    import sys
    import os

    from detectron_tpu.core.configs_presets import mask_rcnn_r50_fpn
    from detectron_tpu.models import model_builder as mb

    mask_rcnn_r50_fpn(num_classes=81)
    config.assert_and_infer_cfg(make_immutable=False)
    params = mb.init_model(jax.random.PRNGKey(0))
    mapping = dwh.full_weight_mapping()
    rng = np.random.RandomState(0)
    blobs = {}
    for name, (path, transform) in mapping.items():
        node = params
        for p in path:
            node = node[p]
        shape = np.asarray(node).shape
        if transform is dwh._conv:
            blob = rng.randn(shape[3], shape[2], shape[0], shape[1])
        elif transform is dwh._deconv:
            blob = rng.randn(shape[2], shape[3], shape[0], shape[1])
        elif transform is dwh._fc:
            blob = rng.randn(shape[1], shape[0])
        else:
            blob = rng.randn(*shape)
        blobs[name] = blob.astype(np.float32)
    pkl = tmp_path / "w.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({"blobs": blobs}, f)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg_file = os.path.join(repo, "configs", "baselines",
                            "e2e_mask_rcnn_R-50-FPN_1x.yaml")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "convert_detectron_pkl.py", "--cfg", cfg_file,
         "--pkl", str(pkl), "--out", str(tmp_path / "ckpt")],
        cwd=os.path.join(repo, "tools"), env=env, capture_output=True,
        text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    from detectron_tpu.utils import net as net_utils

    loaded = net_utils.load_ckpt_params(
        str(tmp_path / "ckpt" / "ckpt" / "model_step0"))
    np.testing.assert_allclose(
        np.asarray(loaded["body"]["conv1"]["w"]),
        dwh._conv(blobs["conv1_w"]), rtol=1e-6)
