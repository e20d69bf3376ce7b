"""Data/tensor-parallel training over a device mesh.

New capability vs. the reference (which is strictly single-device,
SURVEY.md §2/§5.8). The jitted train step from `train.step` is mesh-agnostic;
here we wrap it with sharding constraints: batch over the ``data`` axis,
parameters per `mesh.param_shardings` (wide kernels over ``model``), and let
XLA insert `psum` gradient all-reduces over ICI — the "pick a mesh, annotate
shardings, let XLA do the collectives" recipe.
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from nanowakeword_tpu.parallel import mesh as M
from nanowakeword_tpu.train.step import TrainState, make_train_step


def shard_train_state(state: TrainState, mesh) -> TrainState:
    """Place a TrainState on the mesh: params/opt per the TP rules,
    everything else replicated."""
    pshard = M.param_shardings(state.params, mesh)
    repl = M.replicated(mesh)

    params = jax.tree_util.tree_map(jax.device_put, state.params, pshard)

    def put_repl(x):
        return jax.device_put(x, repl)

    # Optimizer state mirrors parameter shapes: moment buffers satisfy the
    # same shape rule as their parameter and land on the same devices;
    # scalar leaves (counts, schedule state) replicate.
    oshard = M.opt_shardings(state.opt_state, mesh)
    opt_state = jax.tree_util.tree_map(jax.device_put, state.opt_state, oshard)

    return TrainState(
        params=params,
        batch_stats=jax.tree_util.tree_map(put_repl, state.batch_stats),
        opt_state=opt_state,
        step=put_repl(state.step),
        rng=put_repl(state.rng),
    )


def make_dp_train_step(module, tx, mesh, **loss_kwargs):
    """Data-parallel version of train.step.make_train_step.

    Returns (state, features [B,...], labels [B]) -> (state, metrics) with
    B sharded across the data axis. Gradient all-reduce is implicit.
    """
    base = make_train_step(module, tx, jit=False, **loss_kwargs)
    bshard = M.batch_sharding(mesh)

    def step(state, features, labels):
        features = jax.lax.with_sharding_constraint(features, bshard)
        labels = jax.lax.with_sharding_constraint(labels, bshard)
        return base(state, features, labels)

    return jax.jit(step, donate_argnums=(0,))


def device_put_batch(features, labels, mesh):
    """Host batch -> sharded device arrays (one shard per data-axis chip)."""
    bshard = M.batch_sharding(mesh)
    return (jax.device_put(features, bshard), jax.device_put(labels, bshard))
