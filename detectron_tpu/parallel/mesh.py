"""Device mesh setup for data-parallel training and inference.

The TPU-native replacement for the reference's parallel runtime:
- lib/nn/parallel/data_parallel.py :: DataParallel (per-step module
  replication + threaded per-GPU forward + loss gather) becomes a
  jax.sharding.Mesh over chips with the batch sharded on the 'data' axis and
  params replicated: XLA inserts the gradient all-reduce (psum over ICI).
- lib/utils/subprocess.py :: process_in_parallel (per-GPU inference
  subprocesses + pickle files) becomes the same mesh applied to the eval
  batch — single program, no subprocesses.

Multi-host extends transparently: the same mesh spanning all processes'
devices, with jax.make_array_from_process_local_data feeding per-host shards.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None):
    """Multi-host bring-up: every process calls this BEFORE any device use,
    then builds the same global mesh over jax.devices() (all hosts' chips).

    Arguments may be None when the platform provides them (TPU pods expose
    them via the metadata environment); explicit values support manual
    rendezvous (e.g. `--multihost_coordinator host0:1234 --num_hosts 4
    --host_rank $RANK` on each process). No-op for single-process runs.
    """
    if num_processes is not None and int(num_processes) <= 1 and \
            coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=None if num_processes is None else int(num_processes),
        process_id=None if process_id is None else int(process_id))


def make_mesh(n_devices=None, axis_name="data"):
    """1-D data-parallel mesh over the first n_devices devices (all hosts'
    devices in a multi-host run — jax.devices() is global)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def make_mesh_2d(n_data, n_model, axis_names=("data", "model")):
    """2-D (data, model) mesh: batch sharding on 'data', tensor-parallel
    sharding of the wide head FCs on 'model' (see tp_param_shardings). The
    reference has no TP — a 2018 CNN detector — but the head FCs (12544x1024)
    are the one place it pays, and this exercises a real 2-axis layout."""
    devs = jax.devices()[: n_data * n_model]
    return Mesh(np.array(devs).reshape(n_data, n_model), axis_names)


def tp_param_shardings(params, mesh, model_axis="model"):
    """Param-sharding pytree: box-head FC kernels shard their output (fc6)
    / input (fc7) dims over the model axis (Megatron-style column/row
    split); everything else replicates. XLA inserts the psum after the
    row-split matmul automatically."""
    repl = NamedSharding(mesh, P())

    def assign(path, leaf):
        keys = [getattr(p, "key", None) for p in path]
        if "box_head" in keys and "fc6" in keys and keys[-1] == "w":
            return NamedSharding(mesh, P(None, model_axis))
        if "box_head" in keys and "fc6" in keys and keys[-1] == "b":
            return NamedSharding(mesh, P(model_axis))
        if "box_head" in keys and "fc7" in keys and keys[-1] == "w":
            return NamedSharding(mesh, P(model_axis, None))
        return repl

    return jax.tree_util.tree_map_with_path(assign, params)


def batch_sharding(mesh, axis_name="data"):
    """Shard a pytree of batch arrays along their leading (batch) dim."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh, batch, axis_name="data", leading_accum=False):
    """Place a host batch pytree onto the mesh, batch-dim sharded.

    leading_accum: the arrays carry an extra leading iter_size dim (gradient
    accumulation); shard the second dim instead.

    Multi-host: each process passes its LOCAL slice of the global batch
    (global_batch = sum of per-process batches, in process order);
    jax.make_array_from_process_local_data assembles the global sharded
    array without any cross-host copy of another host's data.
    """
    spec = P(None, axis_name) if leading_accum else P(axis_name)
    sh = NamedSharding(mesh, spec)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)), batch)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
