#!/usr/bin/env python
"""Train a Generalized R-CNN with the jit-compiled step-wise loop.

CLI-compatible rebuild of the reference's tools/train_net_step.py: same
flags (--dataset --cfg --bs --nw --iter_size --lr --lr_decay_gamma --resume
--load_ckpt --load_detectron --use_tfboard --no_save --set ...), same
linear-scaling re-derivation of lr/steps when the batch size differs from
the config's NUM_GPUS schedule. The step itself is one pjit'd program over a
data mesh (no DataParallel, no loader-side target assignment).
"""

import argparse
import os
import sys

import numpy as np

import _init_paths  # noqa: F401

from detectron_tpu.core import config as core_config
from detectron_tpu.core.config import (
    assert_and_infer_cfg, cfg, merge_cfg_from_file, merge_cfg_from_list)
from detectron_tpu.utils.logging import setup_logging

logger = setup_logging(__name__)


def parse_args():
    parser = argparse.ArgumentParser(description="Train a detection model")
    parser.add_argument("--dataset", help="coco2017 | coco2014 | keypoints_coco2017 | ...")
    parser.add_argument("--cfg", dest="cfg_file", help="config yaml")
    parser.add_argument("--bs", dest="batch_size", type=int,
                        help="global minibatch size (images)")
    parser.add_argument("--nw", dest="num_workers", type=int,
                        help="data loader threads")
    parser.add_argument("--iter_size", type=int, default=1,
                        help="gradient accumulation steps")
    parser.add_argument("--o", dest="optimizer", help="ignored (SGD only)")
    parser.add_argument("--lr", type=float, help="base LR override")
    parser.add_argument("--lr_decay_gamma", type=float)
    parser.add_argument("--start_step", type=int, default=0)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--load_ckpt", help="checkpoint dir to load")
    parser.add_argument("--load_detectron", help="Detectron .pkl weights")
    parser.add_argument("--use_tfboard", action="store_true")
    parser.add_argument("--no_save", action="store_true")
    parser.add_argument("--ckpt_num_per_epoch", type=int, default=3)
    parser.add_argument("--disp_interval", type=int, default=20)
    parser.add_argument("--set", dest="set_cfgs", nargs="+", default=[])
    # Multi-host (SPMD over a pod): run one process per host with the same
    # command + per-host rank. On TPU pods the three values are usually
    # auto-discovered; pass --multihost alone to trigger auto-init.
    parser.add_argument("--multihost", action="store_true",
                        help="initialize jax.distributed (one process/host)")
    parser.add_argument("--multihost_coordinator", default=None,
                        help="coordinator address host:port (optional)")
    parser.add_argument("--num_hosts", type=int, default=None)
    parser.add_argument("--host_rank", type=int, default=None)
    return parser.parse_args()


DATASET_MAP = {
    "coco2017": ("coco_2017_train",),
    "coco2014": ("coco_2014_train", "coco_2014_valminusminival"),
    "keypoints_coco2017": ("keypoints_coco_2017_train",),
    "keypoints_coco2014": ("keypoints_coco_2014_train",
                           "keypoints_coco_2014_valminusminival"),
    "voc2007": ("voc_2007_trainval",),
    "voc2012": ("voc_2012_trainval",),
}


def main():
    import jax

    from detectron_tpu.data.loader import TrainLoader
    from detectron_tpu.data.roidb import combined_roidb_for_training
    from detectron_tpu.models import model_builder as mb
    from detectron_tpu.parallel import mesh as mesh_mod
    from detectron_tpu.parallel import optimizer as opt
    from detectron_tpu.parallel import train_step as ts
    from detectron_tpu.utils import net as net_utils
    from detectron_tpu.utils.training_stats import TrainingStats

    args = parse_args()
    if args.multihost or args.multihost_coordinator:
        mesh_mod.init_distributed(args.multihost_coordinator,
                                  args.num_hosts, args.host_rank)
        logger.info("multi-host: process %d/%d, %d local / %d global devices",
                    jax.process_index(), jax.process_count(),
                    jax.local_device_count(), jax.device_count())
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

    assert args.iter_size >= 1, "--iter_size must be >= 1"
    n_devices = len(jax.devices())  # GLOBAL device count (all hosts)
    n_procs = jax.process_count()
    original_batch_size = cfg.NUM_GPUS * cfg.TRAIN.IMS_PER_BATCH
    batch_size = args.batch_size or n_devices * cfg.TRAIN.IMS_PER_BATCH
    assert batch_size % n_devices == 0, \
        "batch size must divide the device count"
    assert batch_size % n_procs == 0, \
        "batch size must divide the process count"
    # Per-host data sharding: each process loads its 1/n_procs of every
    # global batch (shard_batch assembles them without cross-host copies).
    local_batch_size = batch_size // n_procs

    # Gradual-warmup linear-scaling rule (reference train_net_step.py):
    # rescale BASE_LR / STEPS / MAX_ITER when bs != the config's schedule.
    step_scale = original_batch_size / (batch_size * args.iter_size)
    old_base_lr = cfg.SOLVER.BASE_LR
    cfg.SOLVER.BASE_LR *= batch_size * args.iter_size / original_batch_size
    cfg.SOLVER.MAX_ITER = int(cfg.SOLVER.MAX_ITER * step_scale)
    cfg.SOLVER.STEPS = tuple(int(s * step_scale) for s in cfg.SOLVER.STEPS)
    logger.info("Linear scaling: lr %.5f -> %.5f, max_iter -> %d",
                old_base_lr, cfg.SOLVER.BASE_LR, cfg.SOLVER.MAX_ITER)
    if args.lr is not None:
        cfg.SOLVER.BASE_LR = args.lr
    if args.lr_decay_gamma is not None:
        cfg.SOLVER.GAMMA = args.lr_decay_gamma
    cfg.TRAIN.IMS_PER_BATCH = batch_size

    assert_and_infer_cfg(make_immutable=False)

    roidb, ratio_list, ratio_index = combined_roidb_for_training(
        cfg.TRAIN.DATASETS, cfg.TRAIN.PROPOSAL_FILES)
    logger.info("%d roidb entries", len(roidb))

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
    start_step = args.start_step
    if args.load_ckpt:
        step_loaded, payload = net_utils.load_ckpt(args.load_ckpt)
        params = payload["params"]
        if args.resume and "opt_state" in payload:
            opt_state = payload["opt_state"]
            start_step = step_loaded
    import jax.numpy as jnp
    opt_state["step"] = jnp.asarray(start_step, jnp.int32)

    mesh = mesh_mod.make_mesh()
    if args.iter_size > 1:
        # Gradient accumulation: one optimizer update per iter_size
        # minibatches (reference inner iter_size loop with loss/iter_size).
        step_fn = ts.make_pjit_train_step_accum(
            mesh, args.iter_size, donate=False)
    else:
        step_fn = ts.make_pjit_train_step(mesh, donate=False)
    # Each process draws a DIFFERENT stream (seed offset by rank): with the
    # epoch-shuffled sampler this gives disjoint-in-expectation per-host
    # shards, the standard pod-scale input pattern.
    loader_seed = cfg.RNG_SEED + jax.process_index()
    logger.info("loader stream seed %d (host %d/%d, local batch %d)",
                loader_seed, jax.process_index(), jax.process_count(),
                local_batch_size)
    loader = TrainLoader(roidb, local_batch_size,
                         seed=loader_seed,
                         num_threads=args.num_workers,
                         # Exact resume: skip the batches steps [0,
                         # start_step) consumed so the stream continues
                         # where the interrupted run left off.
                         start_batch=start_step * args.iter_size)

    is_chief = jax.process_index() == 0

    tblogger = None
    if args.use_tfboard and is_chief:
        from tensorboardX import SummaryWriter
        tblogger = SummaryWriter(output_dir)

    training_stats = TrainingStats(
        args, args.disp_interval, tblogger)
    ckpt_interval = max(
        1, int(len(roidb) / batch_size / args.ckpt_num_per_epoch))

    rng = jax.random.PRNGKey(cfg.RNG_SEED)
    pending_stats = None
    try:
        with mesh:
            for step in range(start_step, cfg.SOLVER.MAX_ITER):
                training_stats.IterTic()
                if args.iter_size > 1:
                    subs = [next(loader) for _ in range(args.iter_size)]
                    host_batch = jax.tree.map(
                        lambda *xs: np.stack(xs), *subs)
                    batch = mesh_mod.shard_batch(
                        mesh, host_batch, leading_accum=True)
                else:
                    batch = mesh_mod.shard_batch(mesh, next(loader))
                params, opt_state, stats = step_fn(
                    params, opt_state, batch, jax.random.fold_in(rng, step))
                training_stats.IterToc()
                # Deferred stats readback: materialize step k-1's losses
                # while step k computes (jit dispatch is async; the
                # np.asarray here is the only per-step host sync point, and
                # on the tunnel it costs a full round-trip).
                if pending_stats is not None:
                    p_stats, p_step = pending_stats
                    training_stats.UpdateIterStats(
                        jax.tree.map(np.asarray, p_stats), p_step)
                    training_stats.LogIterStats(p_step)
                pending_stats = (stats, step)
                if (not args.no_save and is_chief and step > 0
                        and step % ckpt_interval == 0):
                    net_utils.save_ckpt(output_dir, step, params, opt_state)
            if pending_stats is not None:
                p_stats, p_step = pending_stats
                training_stats.UpdateIterStats(
                    jax.tree.map(np.asarray, p_stats), p_step)
                training_stats.LogIterStats(p_step)
                pending_stats = None
        if not args.no_save and is_chief:
            net_utils.save_ckpt(
                output_dir, cfg.SOLVER.MAX_ITER, params, opt_state)
    except (KeyboardInterrupt, Exception):
        # Reference behavior: save a final checkpoint on interrupt/crash.
        if not args.no_save and is_chief:
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
