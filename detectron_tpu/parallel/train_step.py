"""The jit/pjit-compiled training step.

One call = one SGD iteration: loss forward (models/train_graph.py), backward
(jax.grad), gradient all-reduce (implicit psum inserted by XLA from the
shardings), optimizer update (parallel/optimizer.py). This is the TPU-native
whole of the reference's train loop body (tools/train_net_step.py step loop +
mynn.DataParallel + loss.backward + optimizer.step), minus host work.

Gradient accumulation (the reference's --iter_size) is supported by running
the loss/grad part `iter_size` times per update via lax.scan over a stacked
batch.
"""

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from detectron_tpu.models import train_graph
from detectron_tpu.parallel import optimizer as opt


def train_step(params, opt_state, batch, rng):
    """Pure step: returns (new_params, new_opt_state, stats dict)."""

    def loss_fn(p):
        total, parts = train_graph.training_losses(p, batch, rng)
        return total, parts

    (total, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    new_params, new_opt_state, lr = opt.apply_updates(params, grads, opt_state)
    stats = dict(parts)
    stats["loss"] = total
    stats["lr"] = lr
    return new_params, new_opt_state, stats


def make_pjit_train_step(mesh, axis_name="data", donate=True,
                         param_shardings=None):
    """Compile train_step over the mesh: batch sharded on its leading dim,
    params/opt replicated (or per-leaf `param_shardings` for tensor-parallel
    layouts — see parallel/mesh.tp_param_shardings). XLA turns the gradient
    reduction into an ICI all-reduce — the reference's DataParallel grad
    sync."""
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis_name))
    p_sh = param_shardings if param_shardings is not None else repl
    opt_sh = repl if param_shardings is None else {
        "momentum": param_shardings, "step": repl}
    return jax.jit(
        train_step,
        in_shardings=(p_sh, opt_sh, data, repl),
        out_shardings=(p_sh, opt_sh, repl),
        donate_argnums=(0, 1) if donate else (),
    )


def make_pjit_train_step_accum(mesh, iter_size, axis_name="data",
                               donate=True):
    """Gradient-accumulation variant: `batch` has an extra leading iter_size
    dim; grads are averaged over the inner iterations before the update
    (matches the reference's inner `iter_size` loop semantics where each
    inner loss is /iter_size)."""
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(None, axis_name))

    def step(params, opt_state, batches, rng):
        def one(i, acc):
            b = jax.tree.map(lambda x: x[i], batches)
            r = jax.random.fold_in(rng, i)

            def loss_fn(p):
                total, parts = train_graph.training_losses(p, b, r)
                return total / iter_size, parts

            (scaled, parts), g = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            return jax.tree.map(jnp.add, acc, g), parts, scaled

        zeros = jax.tree.map(jnp.zeros_like, params)
        grads = zeros
        parts = None
        total = jnp.float32(0.0)
        for i in range(iter_size):
            grads, parts, scaled = one(i, grads)
            total = total + scaled
        new_params, new_opt_state, lr = opt.apply_updates(
            params, grads, opt_state)
        stats = dict(parts)
        stats["loss"] = total
        stats["lr"] = lr
        return new_params, new_opt_state, stats

    return jax.jit(
        step,
        in_shardings=(repl, repl, data, repl),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1) if donate else (),
    )
