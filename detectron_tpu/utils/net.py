"""Checkpointing and parameter-tree I/O.

Rebuilds lib/utils/net.py's checkpoint surface (save_ckpt/load_ckpt) for
param/optimizer pytrees. Checkpoints are a directory of flat .npy arrays +
a json manifest (portable, no pickle of code). The step/config metadata
mirrors the reference's {step, train_size, batch_size, model, optimizer}
payload. (smooth_l1_loss lives in models/losses.py; get_group_gn in
models/layers.py.)
"""

import json
import os

import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + str(k) + "/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, prefix + str(i) + "/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat):
    root = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def save_ckpt(output_dir, step, params, opt_state=None, meta=None,
              name=None):
    """Write checkpoint to <output_dir>/ckpt/<name or model_step{N}>/.
    The epoch trainer passes name='model_epoch{E}' (reference naming)."""
    ckpt_dir = os.path.join(output_dir, "ckpt",
                            name or "model_step{}".format(step))
    os.makedirs(ckpt_dir, exist_ok=True)
    payload = {"params": params}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    flat = _flatten(payload)
    manifest = {"step": int(step), "arrays": sorted(flat.keys()),
                "meta": meta or {}}
    np.savez(os.path.join(ckpt_dir, "arrays.npz"),
             **{k.replace("/", "|"): v for k, v in flat.items()})
    with open(os.path.join(ckpt_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    return ckpt_dir


def load_ckpt(ckpt_dir):
    """Returns (step, payload dict with 'params' (+ 'opt_state'))."""
    with open(os.path.join(ckpt_dir, "manifest.json")) as f:
        manifest = json.load(f)
    z = np.load(os.path.join(ckpt_dir, "arrays.npz"))
    flat = {k.replace("|", "/"): z[k] for k in z.files}
    payload = _unflatten(flat)
    return manifest["step"], payload


def load_ckpt_params(ckpt_dir, params_template=None):
    _, payload = load_ckpt(ckpt_dir)
    return payload["params"]
