#!/usr/bin/env python
"""Epoch-style trainer (reference: tools/train_net.py).

The reference shipped two trainers: this epoch loop (lr decayed at epoch
milestones, one checkpoint per epoch, per-epoch reshuffle) and the
iteration-style tools/train_net_step.py. Functionally the epoch schedule is
a step schedule with milestones at epoch boundaries, so this entry derives
SOLVER.STEPS / MAX_ITER from --epochs / --lr_decay_epochs and drives the
same pjit-compiled train step; what stays epoch-shaped is the CLI surface,
the per-epoch `ckpt/model_epoch{N}` checkpoints, and epoch-tagged logging.
The loader reshuffles every epoch by construction (data/loader.py).
"""

import argparse
import os

import numpy as np

import _init_paths  # noqa: F401

from detectron_tpu.core.config import (
    assert_and_infer_cfg, cfg, merge_cfg_from_file, merge_cfg_from_list)
from detectron_tpu.utils.logging import setup_logging

logger = setup_logging(__name__)


def parse_args():
    parser = argparse.ArgumentParser(description="Epoch-style training")
    parser.add_argument("--dataset", help="coco2017 | voc2007 | ...")
    parser.add_argument("--cfg", dest="cfg_file", help="config yaml")
    parser.add_argument("--bs", dest="batch_size", type=int,
                        help="global minibatch size (images)")
    parser.add_argument("--nw", dest="num_workers", type=int)
    parser.add_argument("--epochs", dest="num_epochs", type=int, default=6)
    parser.add_argument("--start_epoch", type=int, default=0)
    parser.add_argument("--lr", type=float, help="base LR override")
    parser.add_argument("--lr_decay_epochs", nargs="+", type=int,
                        default=[4, 5],
                        help="epochs at which lr decays by lr_decay_gamma")
    parser.add_argument("--lr_decay_gamma", type=float)
    parser.add_argument("--o", dest="optimizer", help="ignored (SGD only)")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--load_ckpt", help="checkpoint dir to load")
    parser.add_argument("--load_detectron", help="Detectron .pkl weights")
    parser.add_argument("--use_tfboard", action="store_true")
    parser.add_argument("--no_save", action="store_true")
    parser.add_argument("--disp_interval", type=int, default=20)
    parser.add_argument("--set", dest="set_cfgs", nargs="+", default=[])
    return parser.parse_args()


def main():
    import jax
    import jax.numpy as jnp

    from detectron_tpu.data.loader import TrainLoader
    from detectron_tpu.data.roidb import combined_roidb_for_training
    from detectron_tpu.models import model_builder as mb
    from detectron_tpu.parallel import mesh as mesh_mod
    from detectron_tpu.parallel import optimizer as opt
    from detectron_tpu.parallel import train_step as ts
    from detectron_tpu.utils import net as net_utils
    from detectron_tpu.utils.training_stats import TrainingStats

    from train_net_step import DATASET_MAP

    args = parse_args()
    if args.cfg_file:
        merge_cfg_from_file(args.cfg_file)
    if args.set_cfgs:
        merge_cfg_from_list(args.set_cfgs)
    if args.dataset:
        cfg.TRAIN.DATASETS = DATASET_MAP.get(args.dataset, (args.dataset,))
        if "keypoints" in (args.dataset or ""):
            cfg.MODEL.NUM_CLASSES = 2
        elif "coco" in (args.dataset or ""):
            cfg.MODEL.NUM_CLASSES = 81
        elif "voc" in (args.dataset or ""):
            cfg.MODEL.NUM_CLASSES = 21

    n_devices = len(jax.devices())
    batch_size = args.batch_size or n_devices * cfg.TRAIN.IMS_PER_BATCH
    assert batch_size % n_devices == 0, \
        "batch size must divide the device count"
    cfg.TRAIN.IMS_PER_BATCH = batch_size
    if args.lr is not None:
        cfg.SOLVER.BASE_LR = args.lr
    if args.lr_decay_gamma is not None:
        cfg.SOLVER.GAMMA = args.lr_decay_gamma

    assert_and_infer_cfg(make_immutable=False)

    roidb, _, _ = combined_roidb_for_training(
        cfg.TRAIN.DATASETS, cfg.TRAIN.PROPOSAL_FILES)
    logger.info("%d roidb entries", len(roidb))
    steps_per_epoch = max(1, len(roidb) // batch_size)

    # Epoch schedule -> the optimizer's step schedule: decay at epoch
    # boundaries, no warm-up (the reference epoch trainer had none).
    cfg.SOLVER.LR_POLICY = "steps_with_decay"
    cfg.SOLVER.WARM_UP_ITERS = 0
    cfg.SOLVER.STEPS = tuple(
        [0] + [e * steps_per_epoch for e in sorted(args.lr_decay_epochs)])
    cfg.SOLVER.MAX_ITER = args.num_epochs * steps_per_epoch
    logger.info("epochs %d x %d steps; lr decays at epochs %s",
                args.num_epochs, steps_per_epoch, args.lr_decay_epochs)

    output_dir = os.path.join(
        cfg.OUTPUT_DIR,
        os.path.splitext(os.path.basename(args.cfg_file or "default"))[0])
    os.makedirs(output_dir, exist_ok=True)

    params = mb.init_model(jax.random.PRNGKey(cfg.RNG_SEED))
    if args.load_detectron:
        from detectron_tpu.utils import detectron_weight_helper as dwh
        params = dwh.load_detectron_weight(params, args.load_detectron)
    elif cfg.MODEL.LOAD_IMAGENET_PRETRAINED_WEIGHTS:
        from detectron_tpu.utils import resnet_weights_helper as rwh
        params = rwh.load_pretrained_imagenet_weights(params)

    opt_state = opt.init_opt_state(params)
    start_epoch = args.start_epoch
    if args.load_ckpt:
        step_loaded, payload = net_utils.load_ckpt(args.load_ckpt)
        params = payload["params"]
        if args.resume and "opt_state" in payload:
            opt_state = payload["opt_state"]
            start_epoch = step_loaded // steps_per_epoch
    start_step = start_epoch * steps_per_epoch
    opt_state["step"] = jnp.asarray(start_step, jnp.int32)

    mesh = mesh_mod.make_mesh()
    step_fn = ts.make_pjit_train_step(mesh, donate=False)
    loader = TrainLoader(roidb, batch_size, seed=cfg.RNG_SEED,
                         num_threads=args.num_workers,
                         start_batch=start_step)

    tblogger = None
    if args.use_tfboard:
        from tensorboardX import SummaryWriter
        tblogger = SummaryWriter(output_dir)
    training_stats = TrainingStats(args, args.disp_interval, tblogger)

    rng = jax.random.PRNGKey(cfg.RNG_SEED)
    pending_stats = None

    def _flush_stats():
        nonlocal pending_stats
        if pending_stats is not None:
            p_stats, p_step = pending_stats
            training_stats.UpdateIterStats(
                jax.tree.map(np.asarray, p_stats), p_step)
            training_stats.LogIterStats(p_step)
            pending_stats = None

    try:
        with mesh:
            for epoch in range(start_epoch, args.num_epochs):
                logger.info("epoch %d/%d", epoch + 1, args.num_epochs)
                for it in range(steps_per_epoch):
                    step = epoch * steps_per_epoch + it
                    training_stats.IterTic()
                    batch = mesh_mod.shard_batch(mesh, next(loader))
                    params, opt_state, stats = step_fn(
                        params, opt_state, batch,
                        jax.random.fold_in(rng, step))
                    training_stats.IterToc()
                    # Step k-1's losses materialize while step k computes
                    # (the np.asarray is the only per-step host sync).
                    _flush_stats()
                    pending_stats = (stats, step)
                _flush_stats()
                if not args.no_save:
                    net_utils.save_ckpt(
                        output_dir, (epoch + 1) * steps_per_epoch, params,
                        opt_state, name="model_epoch{}".format(epoch + 1))
    except (KeyboardInterrupt, Exception):
        if not args.no_save:
            net_utils.save_ckpt(
                output_dir, int(np.asarray(opt_state["step"])), params,
                opt_state)
        raise
    finally:
        loader.close()
        if tblogger:
            tblogger.close()


if __name__ == "__main__":
    main()
