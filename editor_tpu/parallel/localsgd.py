"""LocalSGD / periodic model averaging.

reference: distributed/algorithms/model_averaging/averagers.py:29
(PeriodicModelAverager) and optim/post_localSGD_optimizer.py:7
(PostLocalSGDOptimizer), plus the post-LocalSGD comm hook
(post_localSGD_hook.py:55): run vanilla all-reduce DDP for ``start_step``
steps, then switch to local updates with params averaged every
``period`` steps.

TPU-native expression: per-device model replicas are a *stacked leading
axis sharded over 'data'* (divergent replicated values aren't expressible
in SPMD jit). Each step runs independent local SGD via the same shard_map
machinery; every ``period`` steps a pmean synchronizes the replicas. The
reference's hierarchical all-reduce subgroups map onto mesh sub-axes.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

Array = jax.Array


def average_params(params: Any, axis_name: str = "data") -> Any:
    """PeriodicModelAverager.average_parameters equivalent."""
    return jax.tree_util.tree_map(lambda x: lax.pmean(x, axis_name), params)


def build_localsgd_train_step(
    local_update: Callable,  # (state, batch, epoch) -> (state, metrics), runs per device
    mesh: Mesh,
    period: int = 4,
    start_step: int = 0,
):
    """Wrap a per-device update into a LocalSGD step.

    ``state`` pytrees carry a leading replica axis sharded over 'data'
    (use ``stack_replicas``). Before ``start_step`` the params are averaged
    every step (== DDP); afterwards only every ``period`` steps.
    """

    def local_body(state, batch, epoch, step_idx):
        # shard_map hands each device its replica slice with leading axis 1
        state = jax.tree_util.tree_map(
            lambda x: x[0] if hasattr(x, "shape") else x, state)
        state, metrics = local_update(state, batch, epoch)
        do_avg = jnp.logical_or(step_idx < start_step,
                                (step_idx + 1) % period == 0)
        params = state.params

        avg = jax.tree_util.tree_map(lambda x: lax.pmean(x, "data"), params)
        new_params = jax.tree_util.tree_map(
            lambda a, p: jnp.where(do_avg, a, p), avg, params)
        state = dataclasses.replace(state, params=new_params)
        metrics = dict(metrics, averaged=do_avg.astype(jnp.int32))
        metrics = jax.tree_util.tree_map(
            lambda x: lax.pmean(jnp.asarray(x, jnp.float32), "data"), metrics)
        state = jax.tree_util.tree_map(
            lambda x: x[None] if hasattr(x, "shape") else x, state)
        return state, metrics

    data = P("data")
    repl = P()

    @jax.jit
    def step(state, batch, epoch, step_idx):
        specs_state = jax.tree_util.tree_map(lambda _: data, state)
        fn = shard_map(
            local_body, mesh=mesh,
            in_specs=(specs_state,
                      jax.tree_util.tree_map(lambda _: data, batch),
                      repl, repl),
            out_specs=(specs_state, repl),
            check_vma=False,
        )
        return fn(state, batch, epoch, step_idx)

    return step


def stack_replicas(state: Any, n: int) -> Any:
    """Tile a train state with a leading replica axis of size n (one replica
    per data-parallel device)."""
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (n,) + x.shape).copy()
        if hasattr(x, "shape") else x, state)


def unstack_replica(state: Any, idx: int = 0) -> Any:
    return jax.tree_util.tree_map(
        lambda x: x[idx] if hasattr(x, "shape") else x, state)
