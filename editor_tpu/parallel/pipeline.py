"""Pipeline parallelism: GPipe-style synchronous microbatch pipeline.

reference: distributed/pipeline/sync/ — Pipe module with chunked
micro-batches (pipe.py:172), clock-cycle scheduler (pipeline.py:83), worker
threads + CUDA stream copy/wait (worker.py:35, copy.py:30), activation
checkpointing (checkpoint.py:253), and profiling-based auto-balance
(_balance/profile.py:44, blockpartition.py:18).

TPU-native re-design: no worker threads, no stream management — ONE
``shard_map`` over a 'stage' mesh axis runs the classic skew-schedule loop:
each device owns one stage's params; per clock tick every stage computes its
microbatch and hands activations to the next stage via ``ppermute`` (ICI
neighbor copy, which XLA overlaps with compute). The M+S-1 tick loop is a
``lax.fori_loop`` — the whole pipeline is a single compiled program.
Activation checkpointing maps onto ``jax.checkpoint`` of the stage fn.
"""

from __future__ import annotations

from typing import Any, Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

Array = jax.Array


def pipeline_apply(
    stage_fn: Callable[[Any, Any], Any],
    stage_params: Any,
    x: Any,
    mesh: Mesh,
    num_microbatches: int,
    axis_name: str = "stage",
    remat: bool = False,
    stage_param_spec: Any = None,
    batch_axis: Optional[str] = None,
    activation_spec: Any = None,
) -> Any:
    """Run ``x`` through S pipeline stages.

    Args:
      stage_fn: (params_for_one_stage, activations) -> activations, same
        activation structure/shape in/out (classic GPipe partition).
      stage_params: pytree with a leading stage axis of size S (stacked per
        stage), sharded over ``axis_name``.
      x: [B, ...] global batch — an array or a PYTREE of arrays sharing the
        same leading batch dim (e.g. the EDITOR backbone carries
        (tokens, rollout-product) across stage boundaries,
        parallel/pipeline_vit.py); B must divide into ``num_microbatches``.
      mesh: mesh containing the ``axis_name`` axis of size S.
      stage_param_spec: optional PartitionSpec pytree for ``stage_params``
        (leading axis must stay ``axis_name``). Lets stages be
        tensor-parallel over a second mesh axis — e.g.
        ``P('stage', None, 'model')`` column-sharded weights with a
        ``psum('model')`` inside ``stage_fn`` (combined PP x TP).
      batch_axis: optional second mesh axis the MICROBATCH dim is sharded
        over (dp x pp composition: each 'data' row of the mesh pipelines its
        own batch shard; gradients combine via the jit-level psum outside).
      activation_spec: optional PartitionSpec pytree matching ``x``, one
        entry per ORIGINAL leaf dim [B, d1, ...], overriding the
        batch_axis-derived specs — lets an activation leaf ride a tensor-
        parallel mesh axis through the schedule (e.g. the EDITOR backbone's
        rollout product sharded over 'model' on its heads dim under PP x TP,
        parallel/pipeline_vit.py).

    Returns: [B, ...] output activations (from the last stage), same pytree
    structure as ``x``.
    """
    S = mesh.shape[axis_name]
    tmap = jax.tree_util.tree_map
    leaves = jax.tree_util.tree_leaves(x)
    B = leaves[0].shape[0]
    if any(l.shape[0] != B for l in leaves):
        raise ValueError("all activation leaves need the same batch dim")
    if B % num_microbatches:
        raise ValueError(f"batch {B} not divisible by {num_microbatches}")
    mb = B // num_microbatches
    xm = tmap(lambda l: l.reshape(num_microbatches, mb, *l.shape[1:]), x)
    fn = jax.checkpoint(stage_fn) if remat else stage_fn

    def per_stage(params_stacked, xm_local):
        params_local = tmap(lambda p: p[0], params_stacked)
        stage = lax.axis_index(axis_name)
        M = num_microbatches
        T = M + S - 1
        outputs = tmap(jnp.zeros_like, xm_local)
        recv = tmap(lambda l: jnp.zeros_like(l[0]), xm_local)

        def tick(carry, t):
            outputs, recv = carry
            # stage 0 consumes microbatch t (clamped; masked out-of-range)
            feed_idx = jnp.clip(t, 0, M - 1)
            inp = tmap(lambda xl, r: jnp.where(stage == 0, xl[feed_idx], r),
                       xm_local, recv)
            out = fn(params_local, inp)
            # last stage commits microbatch t-(S-1) when in range
            commit = (stage == S - 1) & (t >= S - 1)
            out_idx = jnp.clip(t - (S - 1), 0, M - 1)
            outputs = tmap(
                lambda os, o: jnp.where(
                    commit, lax.dynamic_update_index_in_dim(os, o, out_idx, 0),
                    os),
                outputs, out)
            # hand activations to the next stage (ring neighbor copy)
            perm = [(i, (i + 1) % S) for i in range(S)]
            recv = tmap(lambda o: lax.ppermute(o, axis_name, perm), out)
            return (outputs, recv), None

        # scan (not fori_loop) so the schedule is reverse-differentiable:
        # jax.grad through the pipeline runs the mirrored backward schedule
        # with reversed ppermutes — the 1F1B-equivalent of the reference's
        # autograd through Fork/Join (pipeline/sync/dependency.py:28-47)
        (outputs, _), _ = lax.scan(tick, (outputs, recv), jnp.arange(T))
        return tmap(lambda o: o[None], outputs)  # stage axis for the out_spec

    stage_spec = stage_param_spec if stage_param_spec is not None else \
        tmap(lambda _: P(axis_name), stage_params)
    if activation_spec is not None:
        # [M, mb, d1, ...] in, [S, M, mb, d1, ...] out — per-leaf specs
        # over the original [B, d1, ...] dims (B's entry shards mb)
        in_spec = jax.tree_util.tree_map(
            lambda s: P(None, *s), activation_spec,
            is_leaf=lambda s: isinstance(s, P))
        out_spec = jax.tree_util.tree_map(
            lambda s: P(axis_name, None, *s), activation_spec,
            is_leaf=lambda s: isinstance(s, P))
    elif batch_axis is None:
        in_spec, out_spec = P(), P(axis_name)
    else:
        # [M, mb, ...] in, [S, M, mb, ...] out — mb sharded over batch_axis
        in_spec = tmap(
            lambda l: P(*([None, batch_axis] + [None] * (l.ndim - 2))), xm)
        out_spec = tmap(
            lambda l: P(*([axis_name, None, batch_axis]
                          + [None] * (l.ndim - 2))), xm)
    out = shard_map(
        per_stage, mesh=mesh,
        in_specs=(stage_spec, in_spec),
        out_specs=out_spec,
        check_vma=False,
    )(stage_params, xm)
    # out: [S, M, mb, ...]; the last stage's buffer holds the results
    return tmap(lambda o: o[-1].reshape(B, *o.shape[3:]), out)


def pipeline_train_step(
    stage_fn: Callable[[Any, Array], Array],
    loss_fn: Callable[[Array], Array],
    mesh: Mesh,
    num_microbatches: int,
    axis_name: str = "stage",
    remat: bool = True,
    stage_param_spec: Any = None,
) -> Callable:
    """Build a jitted (stage_params, x) -> (loss, grads) step that trains
    THROUGH the pipeline (reference ``Pipe`` exists to train:
    distributed/pipeline/sync/pipe.py:172 with activation checkpointing
    checkpoint.py:253 — here ``remat=True`` wraps the stage fn in
    ``jax.checkpoint`` so each microbatch's activations are recomputed in
    the backward schedule, the 'always' checkpoint mode).

    grads have the same stacked-stage leading axis as ``stage_params`` and
    are exact (loss/grad parity with single-device execution is asserted in
    tests/test_parallel.py)."""

    def loss_of(stage_params, x):
        out = pipeline_apply(stage_fn, stage_params, x, mesh,
                             num_microbatches, axis_name, remat=remat,
                             stage_param_spec=stage_param_spec)
        return loss_fn(out)

    return jax.jit(jax.value_and_grad(loss_of))


# ---------------------------------------------------------------------------
# auto-balance (reference _balance/blockpartition.py:18 — minimize the max
# stage cost over contiguous layer blocks)
# ---------------------------------------------------------------------------

def balance_stages(costs: Sequence[float], num_stages: int) -> List[int]:
    """Partition layers into contiguous blocks minimizing the bottleneck cost.
    Returns the number of layers per stage. O(n² · S) DP — n is tiny."""
    n = len(costs)
    if num_stages > n:
        raise ValueError("more stages than layers")
    prefix = [0.0]
    for c in costs:
        prefix.append(prefix[-1] + c)
    block = lambda i, j: prefix[j] - prefix[i]  # cost of layers [i, j)

    INF = float("inf")
    # dp[s][j] = minimal bottleneck for first j layers in s blocks
    dp = [[INF] * (n + 1) for _ in range(num_stages + 1)]
    cut = [[0] * (n + 1) for _ in range(num_stages + 1)]
    dp[0][0] = 0.0
    for s in range(1, num_stages + 1):
        for j in range(s, n + 1):
            for i in range(s - 1, j):
                cand = max(dp[s - 1][i], block(i, j))
                if cand < dp[s][j]:
                    dp[s][j] = cand
                    cut[s][j] = i
    sizes = []
    j = n
    for s in range(num_stages, 0, -1):
        i = cut[s][j]
        sizes.append(j - i)
        j = i
    return list(reversed(sizes))


def profile_layer_costs(layer_fns: Sequence[Callable], x: Array,
                        iters: int = 3) -> List[float]:
    """Wall-clock per-layer cost profile (reference _balance/profile.py:44):
    feeds each layer its predecessor's output and times jitted execution."""
    import time
    costs = []
    for fn in layer_fns:
        jf = jax.jit(fn)
        y = jf(x)
        jax.block_until_ready(y)
        t0 = time.perf_counter()
        for _ in range(iters):
            y = jf(x)
        jax.block_until_ready(y)
        costs.append((time.perf_counter() - t0) / iters)
        x = y
    return costs
