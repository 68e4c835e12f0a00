"""Sequence parallelism: ring attention and Ulysses (DeepSpeed-style).

The reference has NO sequence/context parallelism anywhere in its vendored
torch.distributed snapshot (SURVEY.md §2.2 "Parallelism checklist" lists
SP/CP/ring/Ulysses as absent — its sequences top out at 3·129 = 387 fusion
tokens). These are the TPU-native demonstrations SURVEY §7 asks for: on a
device mesh with a ``seq`` axis, both strategies are a few dozen lines of
``shard_map`` + XLA collectives riding ICI — no NCCL plumbing, no custom
process groups.

* :func:`ring_attention` — q stays put, (k, v) blocks rotate around the
  ring via ``ppermute`` while each step folds its block into a running
  log-sum-exp softmax accumulator (the online-softmax recurrence of flash
  attention, blocked across DEVICES instead of VMEM tiles). Peak memory
  per chip is O(N·N/S) logits; comm is the (k, v) ring traffic, fully
  overlappable by XLA's async collectives.
* :func:`ulysses_attention` — ``all_to_all`` re-shards from
  sequence-sharded to head-sharded, runs plain full attention on the
  gathered local sequence for H/S heads, and ``all_to_all``s back.
  Cheaper compute (no recurrence), but requires H divisible by the axis
  size and gathers the full sequence per chip.

Both compute bidirectional (non-causal) softmax attention — the only kind
EDITOR uses. Exactness: ring attention's online-softmax recurrence is
algebraically the standard stabilized softmax (each step renormalizes by
exp(m_old - m_new)); parity is tested against single-device attention on
the virtual CPU mesh (tests/test_ring.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

Array = jax.Array


def _full_attention(q: Array, k: Array, v: Array, scale: float) -> Array:
    """Plain stabilized softmax attention. q/k/v: [B, H, N, D]."""
    cd = jnp.promote_types(q.dtype, jnp.float32)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=cd) * scale
    p = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                     preferred_element_type=cd)
    return out.astype(q.dtype)


def _ring_shard(q: Array, k: Array, v: Array, *, axis_name: str, S: int,
                scale: float) -> Array:
    """Per-shard body: q [B,H,nq,D] local, k/v [B,H,nk,D] local blocks."""
    B, H, nq, D = q.shape
    m = jnp.full((B, H, nq), -jnp.inf, jnp.float32)      # running row max
    den = jnp.zeros((B, H, nq), jnp.float32)             # running denom
    acc = jnp.zeros((B, H, nq, D), jnp.float32)          # running numerator
    perm = [(i, (i + 1) % S) for i in range(S)]

    def step(_, carry):
        m, den, acc, k, v = carry
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1))
        corr = jnp.exp(m - m_new)                        # exp(-inf-*) -> 0
        p = jnp.exp(logits - m_new[..., None])
        den = den * corr + jnp.sum(p, axis=-1)
        acc = acc * corr[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p.astype(v.dtype), v,
            preferred_element_type=jnp.float32)
        # rotate the (k, v) blocks one hop around the ring (ICI neighbor
        # traffic; XLA overlaps the permute with the next step's einsums)
        k = jax.lax.ppermute(k, axis_name, perm)
        v = jax.lax.ppermute(v, axis_name, perm)
        return m_new, den, acc, k, v

    m, den, acc, k, v = jax.lax.fori_loop(0, S, step, (m, den, acc, k, v))
    return (acc / den[..., None]).astype(q.dtype)


def ring_attention(q: Array, k: Array, v: Array, mesh: Mesh,
                   seq_axis: str = "seq",
                   scale: Optional[float] = None) -> Array:
    """Ring attention over a sequence-sharded mesh axis.

    q/k/v: [B, H, N, D] with N sharded over ``seq_axis`` (all other axes
    replicated w.r.t. it). Returns [B, H, N, D], sequence-sharded the same
    way. N must be divisible by the axis size.
    """
    S = mesh.shape[seq_axis]
    if q.shape[2] % S:
        raise ValueError(f"sequence {q.shape[2]} not divisible by "
                         f"{seq_axis}={S}")
    scale = q.shape[-1] ** -0.5 if scale is None else scale
    spec = P(None, None, seq_axis, None)
    fn = shard_map(
        functools.partial(_ring_shard, axis_name=seq_axis, S=S, scale=scale),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False)
    return fn(q, k, v)


def _ring_masked_shard(q: Array, k: Array, v: Array, mask: Array, *,
                       axis_name: str, S: int, scale: float,
                       fill: float) -> Array:
    """Per-shard body for HMA masked ring attention: q and its query-mask
    block stay put; (k, v, key-mask) rotate. The mask bias is the exact
    reference algebra (vit_pytorch.py:240-258): logits where
    ``mask_q·mask_k == 0`` are REPLACED by -65504 (finite, so fully-masked
    rows stay NaN-free), and output rows are re-multiplied by the query
    mask. The online-softmax recurrence over the filled logits equals the
    global stabilized softmax over the same filled logits, so this is
    bit-for-bit the distributed form of ``_xla_masked_attention``'s math.
    """
    B, H, nq, D = q.shape
    mq = mask.astype(jnp.float32)                        # [B, nq] local
    m = jnp.full((B, H, nq), -jnp.inf, jnp.float32)
    den = jnp.zeros((B, H, nq), jnp.float32)
    acc = jnp.zeros((B, H, nq, D), jnp.float32)
    perm = [(i, (i + 1) % S) for i in range(S)]

    def step(_, carry):
        m, den, acc, k, v, mk = carry
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        pair = mq[:, None, :, None] * mk[:, None, None, :]  # [B,1,nq,nk]
        logits = jnp.where(pair == 0, fill, logits)
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1))
        corr = jnp.exp(m - m_new)
        p = jnp.exp(logits - m_new[..., None])
        den = den * corr + jnp.sum(p, axis=-1)
        acc = acc * corr[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p.astype(v.dtype), v,
            preferred_element_type=jnp.float32)
        k = jax.lax.ppermute(k, axis_name, perm)
        v = jax.lax.ppermute(v, axis_name, perm)
        mk = jax.lax.ppermute(mk, axis_name, perm)
        return m_new, den, acc, k, v, mk

    init = (m, den, acc, k, v, mq)
    m, den, acc, k, v, mk = jax.lax.fori_loop(0, S, step, init)
    out = acc / den[..., None] * mq[:, None, :, None]    # re-mask query rows
    return out.astype(q.dtype)


def ring_masked_attention(q: Array, k: Array, v: Array, mask: Array,
                          mesh: Mesh, seq_axis: str = "seq",
                          scale: Optional[float] = None,
                          mask_fill: float = -65504.0) -> Array:
    """HMA masked attention (ops/masked_attention semantics) with the
    sequence ring-sharded over ``seq_axis`` — the k/v rotation carries the
    key-token mask so every block applies the reference's -65504 pair bias.

    q/k/v: [B, H, N, D]; mask: [B, N] (1 = keep), both N-sharded over
    ``seq_axis``. Parity vs ``_xla_masked_attention`` is asserted in
    tests/test_ring.py.
    """
    S = mesh.shape[seq_axis]
    if q.shape[2] % S:
        raise ValueError(f"sequence {q.shape[2]} not divisible by "
                         f"{seq_axis}={S}")
    scale = q.shape[-1] ** -0.5 if scale is None else scale
    spec = P(None, None, seq_axis, None)
    fn = shard_map(
        functools.partial(_ring_masked_shard, axis_name=seq_axis, S=S,
                          scale=scale, fill=mask_fill),
        mesh=mesh, in_specs=(spec, spec, spec, P(None, seq_axis)),
        out_specs=spec, check_vma=False)
    return fn(q, k, v, mask)


def _ulysses_masked_shard(q: Array, k: Array, v: Array, mask: Array, *,
                          axis_name: str, S: int, scale: float,
                          fill: float) -> Array:
    """Per-shard body: all_to_all to head sharding, full masked attention
    (reference -65504 algebra) on the gathered sequence, all_to_all back.
    The token mask is all-gathered — it is [B, N] bits, noise next to the
    gathered k/v blocks."""
    from editor_tpu.ops.masked_attention import _xla_masked_attention

    a2a = functools.partial(jax.lax.all_to_all, axis_name=axis_name,
                            split_axis=1, concat_axis=2, tiled=True)
    qh, kh, vh = a2a(q), a2a(k), a2a(v)          # [B, H/S, N, D]
    mfull = jax.lax.all_gather(mask, axis_name, axis=1, tiled=True)  # [B, N]
    out = _xla_masked_attention(qh, kh, vh, mfull, scale, fill)
    return jax.lax.all_to_all(out, axis_name=axis_name, split_axis=2,
                              concat_axis=1, tiled=True)


def ulysses_masked_attention(q: Array, k: Array, v: Array, mask: Array,
                             mesh: Mesh, seq_axis: str = "seq",
                             scale: Optional[float] = None,
                             mask_fill: float = -65504.0) -> Array:
    """Ulysses-style HMA masked attention: sequence-sharded in/out, heads
    sharded inside (H must divide by the axis size). Same reference masking
    semantics as :func:`ring_masked_attention`."""
    S = mesh.shape[seq_axis]
    if q.shape[1] % S:
        raise ValueError(f"heads {q.shape[1]} not divisible by "
                         f"{seq_axis}={S}")
    if q.shape[2] % S:
        raise ValueError(f"sequence {q.shape[2]} not divisible by "
                         f"{seq_axis}={S}")
    scale = q.shape[-1] ** -0.5 if scale is None else scale
    spec = P(None, None, seq_axis, None)
    fn = shard_map(
        functools.partial(_ulysses_masked_shard, axis_name=seq_axis, S=S,
                          scale=scale, fill=mask_fill),
        mesh=mesh, in_specs=(spec, spec, spec, P(None, seq_axis)),
        out_specs=spec, check_vma=False)
    return fn(q, k, v, mask)


def _ulysses_shard(q: Array, k: Array, v: Array, *, axis_name: str, S: int,
                   scale: float) -> Array:
    """Per-shard body: [B, H, nq, D] sequence-sharded in, same out."""
    # seq-sharded -> head-sharded: split heads across the axis, gather seq
    a2a = functools.partial(jax.lax.all_to_all, axis_name=axis_name,
                            split_axis=1, concat_axis=2, tiled=True)
    qh, kh, vh = a2a(q), a2a(k), a2a(v)          # [B, H/S, N, D]
    out = _full_attention(qh, kh, vh, scale)
    # head-sharded -> seq-sharded
    return jax.lax.all_to_all(out, axis_name=axis_name, split_axis=2,
                              concat_axis=1, tiled=True)


def ulysses_attention(q: Array, k: Array, v: Array, mesh: Mesh,
                      seq_axis: str = "seq",
                      scale: Optional[float] = None) -> Array:
    """Ulysses sequence parallelism: all_to_all to head sharding, full
    attention on the gathered sequence, all_to_all back.

    q/k/v: [B, H, N, D], N sharded over ``seq_axis``; H must be divisible
    by the axis size.
    """
    S = mesh.shape[seq_axis]
    if q.shape[1] % S:
        raise ValueError(f"heads {q.shape[1]} not divisible by "
                         f"{seq_axis}={S}")
    if q.shape[2] % S:
        raise ValueError(f"sequence {q.shape[2]} not divisible by "
                         f"{seq_axis}={S}")
    scale = q.shape[-1] ** -0.5 if scale is None else scale
    spec = P(None, None, seq_axis, None)
    fn = shard_map(
        functools.partial(_ulysses_shard, axis_name=seq_axis, S=S,
                          scale=scale),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False)
    return fn(q, k, v)
