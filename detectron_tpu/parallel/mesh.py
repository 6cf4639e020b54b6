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


def make_mesh(n_devices=None, axis_name="data"):
    """1-D data-parallel mesh over the first n_devices devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def batch_sharding(mesh, axis_name="data"):
    """Shard a pytree of batch arrays along their leading (batch) dim."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh, batch, axis_name="data"):
    """Place a host batch pytree onto the mesh, batch-dim sharded."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
