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
    stage_fn: Callable[..., Any],
    stage_params: Any,
    x: Any,
    mesh: Mesh,
    num_microbatches: int,
    axis_name: str = "stage",
    remat: bool = False,
    stage_param_spec: Any = None,
    batch_axis: Optional[str] = None,
    activation_spec: Any = None,
    stage_state: Any = None,
    stage_state_spec: Any = None,
) -> Any:
    """Run ``x`` through S pipeline stages.

    Args:
      stage_fn: (params_for_one_stage, activations) -> activations, same
        activation structure/shape in/out (classic GPipe partition). When
        ``stage_state`` is given the signature becomes
        ``(params, activations, state, valid) -> (activations, state)``
        where ``state`` is this stage's carried state (updated every tick)
        and ``valid`` is a traced bool — False on warm-up/drain ticks where
        the stage processes schedule bubbles, so stateful layers (e.g.
        :mod:`editor_tpu.parallel.deferred_bn`) mask their accumulation.
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
      stage_state: optional pytree of per-stage carried state with a
        leading stage axis of size S (like ``stage_params``), sharded over
        ``axis_name``. Carried across clock ticks within one
        ``pipeline_apply`` — the TPU-functional analogue of the reference's
        cross-microbatch module buffers (``DeferredBatchNorm``'s
        sum/sum_squares, pipeline/sync/batchnorm.py:43-45).
      stage_state_spec: optional PartitionSpec pytree for ``stage_state``.

    Returns: [B, ...] output activations (from the last stage), same pytree
    structure as ``x`` — or ``(outputs, final_stage_state)`` when
    ``stage_state`` is given.
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
    stateful = stage_state is not None
    if stateful:
        raw_fn = stage_fn
    else:
        # unify on the stateful form with an empty-dict state
        def raw_fn(p, a, st, valid):  # noqa: ANN001
            del st, valid
            return stage_fn(p, a), {}
        stage_state = {}
    fn = jax.checkpoint(raw_fn, static_argnums=()) if remat else raw_fn

    def per_stage(params_stacked, xm_local, state_stacked):
        params_local = tmap(lambda p: p[0], params_stacked)
        state_local = tmap(lambda p: p[0], state_stacked)
        stage = lax.axis_index(axis_name)
        M = num_microbatches
        T = M + S - 1
        outputs = tmap(jnp.zeros_like, xm_local)
        recv = tmap(lambda l: jnp.zeros_like(l[0]), xm_local)

        def tick(carry, t):
            outputs, recv, st = carry
            # stage 0 consumes microbatch t (clamped; masked out-of-range)
            feed_idx = jnp.clip(t, 0, M - 1)
            inp = tmap(lambda xl, r: jnp.where(stage == 0, xl[feed_idx], r),
                       xm_local, recv)
            # stage s holds REAL data (microbatch t-s) iff s <= t <= s+M-1;
            # other ticks are schedule bubbles a stateful layer must mask
            valid = (t >= stage) & (t <= stage + M - 1)
            out, st = fn(params_local, inp, st, valid)
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
            return (outputs, recv, st), None

        # scan (not fori_loop) so the schedule is reverse-differentiable:
        # jax.grad through the pipeline runs the mirrored backward schedule
        # with reversed ppermutes — the 1F1B-equivalent of the reference's
        # autograd through Fork/Join (pipeline/sync/dependency.py:28-47)
        (outputs, _, state_local), _ = lax.scan(
            tick, (outputs, recv, state_local), jnp.arange(T))
        return (tmap(lambda o: o[None], outputs),      # stage axis for the
                tmap(lambda s: s[None], state_local))  # out_specs

    stage_spec = stage_param_spec if stage_param_spec is not None else \
        tmap(lambda _: P(axis_name), stage_params)
    state_spec = stage_state_spec if stage_state_spec is not None else \
        tmap(lambda _: P(axis_name), stage_state)
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
    out, new_state = shard_map(
        per_stage, mesh=mesh,
        in_specs=(stage_spec, in_spec, state_spec),
        out_specs=(out_spec, state_spec),
        check_vma=False,
    )(stage_params, xm, stage_state)
    # out: [S, M, mb, ...]; the last stage's buffer holds the results
    result = tmap(lambda o: o[-1].reshape(B, *o.shape[3:]), out)
    if stateful:
        return result, new_state
    return result


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
# cross-stage skip tensors (reference pipeline/sync/skip/skippable.py:52,
# portal.py:29 — @skippable(stash=[...]) / yield stash(name, x) /
# yield pop(name))
# ---------------------------------------------------------------------------
#
# TPU re-design: the reference needs Skippable/Portal machinery because its
# stages pass exactly ONE tensor between GPUs and a skip tensor must be
# routed around the intermediate devices (a portal holds it on the source
# GPU and copies it directly to the consumer's device/stream). Here the
# inter-stage payload is already an arbitrary PYTREE moving over the ICI
# ring, so a skip is simply a named slot that travels WITH its microbatch:
# `stash` writes the slot, intermediate stages relay it untouched (each hop
# is a neighbor ppermute that XLA overlaps with compute — on a ring there
# is no shorter route), and `pop` reads it and zeroes the slot so the wire
# cost drops back to nothing... except the slot's static shape. Namespacing
# (`skippable.py` Namespace) is plain dict keys. Autograd through
# stash/pop needs no Fork/Join: the slot is part of the scanned carry, so
# jax.grad routes the skip's cotangent back through the same relay.

def init_skips(batch: int, templates: dict) -> dict:
    """Zero-filled skip slots for :func:`pipeline_apply`'s activation
    pytree: ``{name: [d1, ...] template}`` -> ``{name: zeros[B, d1, ...]}``.
    Feed the result alongside the real activations, e.g.
    ``x = (tokens, init_skips(B, {'1to3': jnp.zeros((C,))}))``."""
    return {name: jnp.zeros((batch,) + tuple(t.shape), t.dtype)
            for name, t in templates.items()}


def stash(skips: dict, name: str, value: Array) -> dict:
    """Write a named skip slot (reference ``yield stash(name, tensor)``,
    skippable.py:310). The slot must exist in the pytree (init_skips) and
    ``value`` must match its static shape."""
    if name not in skips:
        raise KeyError(f"skip slot {name!r} not declared (init_skips)")
    if skips[name].shape != value.shape:
        raise ValueError(
            f"skip {name!r}: stash shape {value.shape} != slot "
            f"{skips[name].shape}")
    out = dict(skips)
    out[name] = value
    return out


def pop(skips: dict, name: str):
    """Read a named skip slot and zero it (reference ``yield pop(name)``,
    skippable.py:332 — a popped skip is consumed). Returns
    ``(value, skips)``."""
    if name not in skips:
        raise KeyError(f"skip slot {name!r} not declared (init_skips)")
    value = skips[name]
    out = dict(skips)
    out[name] = jnp.zeros_like(value)
    return value, out


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
