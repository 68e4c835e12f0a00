"""Expert parallelism: a mesh-native mixture-of-experts layer.

EP/MoE is the last entry in SURVEY.md §2.2's absent-from-reference
parallelism list (after SP — see parallel/ring.py). This is the TPU-native
demonstration: experts are sharded over an ``expert`` mesh axis and tokens
travel to their experts through ONE ``all_to_all`` each way — the exact
dispatch/combine shape GShard/Switch use — with a dense-parity oracle so
the routing algebra is testable on the virtual CPU mesh.

Design (static shapes throughout, XLA-friendly):
  * router: linear logits → top-k experts per token, softmax over the
    selected k (Switch/GShard style, renormalized gates).
  * capacity: each (expert, shard) pair owns a fixed ``capacity`` slot
    buffer; tokens beyond capacity are DROPPED (their gate contribution
    is 0, the residual path carries them) — the standard static-shape MoE
    contract, no dynamic shapes anywhere.
  * dispatch: tokens are packed into [E, capacity, D] send buffers with a
    one-hot position matmul (MXU-friendly scatter), ``all_to_all`` over
    the expert axis, per-expert FFN on the local shard, ``all_to_all``
    back, then a transposed one-hot matmul combines expert outputs scaled
    by their gates.
  * aux loss: the Switch load-balancing loss (mean fraction of tokens per
    expert · mean router prob per expert · E).

``moe_ffn_dense`` computes the same function without a mesh (every expert
on every device) — the parity oracle for tests and the single-chip path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

Array = jax.Array


class MoEParams(NamedTuple):
    router: Array   # [D, E]
    w1: Array       # [E, D, F]
    b1: Array       # [E, F]
    w2: Array       # [E, F, D]
    b2: Array       # [E, D]


def moe_init(key: Array, dim: int, hidden: int, num_experts: int,
             dtype=jnp.float32) -> MoEParams:
    ks = jax.random.split(key, 3)
    s1 = (2.0 / dim) ** 0.5
    s2 = (2.0 / hidden) ** 0.5
    return MoEParams(
        router=(jax.random.normal(ks[0], (dim, num_experts)) * 0.02
                ).astype(dtype),
        w1=(jax.random.normal(ks[1], (num_experts, dim, hidden)) * s1
            ).astype(dtype),
        b1=jnp.zeros((num_experts, hidden), dtype),
        w2=(jax.random.normal(ks[2], (num_experts, hidden, dim)) * s2
            ).astype(dtype),
        b2=jnp.zeros((num_experts, dim), dtype),
    )


def _route(router: Array, x: Array, k: int
           ) -> Tuple[Array, Array, Array]:
    """x: [T, D] → (gates [T, k], expert_idx [T, k] int32, aux_loss)."""
    logits = x.astype(jnp.float32) @ router.astype(jnp.float32)  # [T, E]
    probs = jax.nn.softmax(logits, axis=-1)
    gates, idx = jax.lax.top_k(probs, k)                    # [T, k]
    gates = gates / jnp.sum(gates, axis=-1, keepdims=True)  # renormalize
    E = router.shape[-1]
    # Switch load-balance loss: E · Σ_e f_e · p_e
    sel1 = jax.nn.one_hot(idx[:, 0], E, dtype=jnp.float32)  # primary expert
    f = jnp.mean(sel1, axis=0)
    p = jnp.mean(probs, axis=0)
    aux = E * jnp.sum(f * p)
    return gates, idx, aux


def _dispatch_masks(idx: Array, gates: Array, E: int, capacity: int
                    ) -> Tuple[Array, Array]:
    """Static-shape dispatch/combine tensors.

    Returns (dispatch [T, E, C] one-hot {0,1}, combine [T, E, C] gated).
    Position of a token in its expert's buffer = its running count among
    tokens routed to that expert (per (expert, k-choice) order); tokens at
    position >= capacity are dropped.
    """
    T, K = idx.shape
    sel = jax.nn.one_hot(idx, E, dtype=jnp.int32)            # [T, K, E]
    # running position of each (token, choice) within its expert, counting
    # all choices of earlier tokens and earlier choices of this token
    flat = sel.reshape(T * K, E)
    pos = jnp.cumsum(flat, axis=0) - flat                    # [T·K, E]
    pos = jnp.sum(pos * flat, axis=-1).reshape(T, K)         # [T, K]
    keep = pos < capacity
    # build [T, K, E, C] then reduce K
    oh_e = jax.nn.one_hot(idx, E, dtype=jnp.float32)         # [T, K, E]
    oh_c = jax.nn.one_hot(jnp.where(keep, pos, capacity), capacity,
                          dtype=jnp.float32)                 # [T, K, C]
    tkec = oh_e[:, :, :, None] * oh_c[:, :, None, :]         # [T, K, E, C]
    disp = jnp.sum(tkec, axis=1)                             # [T, E, C]
    comb = jnp.sum(tkec * gates[:, :, None, None], axis=1)   # [T, E, C]
    return disp, comb


def _expert_ffn(w1, b1, w2, b2, x):
    """x: [..., C, D] for one expert."""
    h = jax.nn.gelu(x @ w1 + b1)
    return h @ w2 + b2


def moe_ffn_dense(params: MoEParams, x: Array, k: int = 2,
                  capacity_factor: float = 2.0,
                  capacity: Optional[int] = None
                  ) -> Tuple[Array, Array]:
    """Dense (no-mesh) MoE oracle. x: [T, D] → ([T, D], aux_loss).

    ``capacity`` overrides the derived per-expert slot count — used by the
    single-device oracle of the expert-parallel path, whose capacity is
    derived from the PER-SHARD token count (see moe_ffn)."""
    T, D = x.shape
    E = params.router.shape[-1]
    C = capacity if capacity is not None else (
        int(capacity_factor * k * T / E) or 1)
    gates, idx, aux = _route(params.router, x, k)
    disp, comb = _dispatch_masks(idx, gates, E, C)
    xe = jnp.einsum("td,tec->ecd", x.astype(jnp.float32), disp)  # [E, C, D]
    ye = jax.vmap(_expert_ffn)(params.w1.astype(jnp.float32),
                               params.b1.astype(jnp.float32),
                               params.w2.astype(jnp.float32),
                               params.b2.astype(jnp.float32), xe)
    y = jnp.einsum("ecd,tec->td", ye, comb)
    return y.astype(x.dtype), aux


def _moe_shard(x, router, w1, b1, w2, b2, *, axis_name: str, S: int,
               k: int, capacity: int):
    """Per-shard body. x: [Tl, D] local tokens; w*/b*: [El, ...] local
    experts (E = S · El). Dispatch buffers are exchanged expert-major so
    each shard receives every other shard's slice for ITS experts."""
    # router weights are replicated: route against ALL E experts
    E_local = w1.shape[0]
    E = S * E_local
    gates, idx, aux = _route(router, x, k)
    disp, comb = _dispatch_masks(idx, gates, E, capacity)
    xe = jnp.einsum("td,tec->ecd", x.astype(jnp.float32), disp)  # [E, C, D]
    # [E, C, D] → split E across shards: all_to_all sends each expert's
    # buffer to its owner; result: [E_local · S, C, D] where the leading
    # axis now enumerates (source shard, local expert)
    xr = jax.lax.all_to_all(xe, axis_name, split_axis=0, concat_axis=0,
                            tiled=True)                      # [S·El, C, D]
    xr = xr.reshape(S, E_local, capacity, -1).transpose(1, 0, 2, 3)
    xr = xr.reshape(E_local, S * capacity, -1)               # [El, S·C, D]
    ye = jax.vmap(_expert_ffn)(w1.astype(jnp.float32),
                               b1.astype(jnp.float32),
                               w2.astype(jnp.float32),
                               b2.astype(jnp.float32), xr)   # [El, S·C, D]
    ye = ye.reshape(E_local, S, capacity, -1).transpose(1, 0, 2, 3)
    ye = ye.reshape(S * E_local, capacity, -1)
    yr = jax.lax.all_to_all(ye, axis_name, split_axis=0, concat_axis=0,
                            tiled=True)                      # [E, C, D]
    y = jnp.einsum("ecd,tec->td", yr, comb)
    aux = jax.lax.pmean(aux, axis_name)
    return y.astype(x.dtype), aux


def moe_ffn(params: MoEParams, x: Array, mesh: Mesh,
            expert_axis: str = "expert", k: int = 2,
            capacity_factor: float = 2.0) -> Tuple[Array, Array]:
    """Expert-parallel MoE over ``expert_axis``: tokens sharded over the
    axis, experts sharded over the axis, one all_to_all each way.

    x: [T, D] with T sharded over ``expert_axis``; params.w1/b1/w2/b2
    sharded on their leading (expert) axis; router replicated.
    Same math as :func:`moe_ffn_dense` run independently per token shard
    (each shard has its own capacity buffers).
    """
    S = mesh.shape[expert_axis]
    E = params.router.shape[-1]
    if E % S:
        raise ValueError(f"experts {E} not divisible by {expert_axis}={S}")
    if x.shape[0] % S:
        raise ValueError(f"tokens {x.shape[0]} not divisible by "
                         f"{expert_axis}={S}")
    Tl = x.shape[0] // S
    capacity = int(capacity_factor * k * Tl / E) or 1
    fn = shard_map(
        functools.partial(_moe_shard, axis_name=expert_axis, S=S, k=k,
                          capacity=capacity),
        mesh=mesh,
        in_specs=(P(expert_axis, None), P(), P(expert_axis), P(expert_axis),
                  P(expert_axis), P(expert_axis)),
        out_specs=(P(expert_axis, None), P()),
        check_vma=False)
    return fn(x, params.router, params.w1, params.b1, params.w2, params.b2)
