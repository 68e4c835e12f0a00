"""Device-side k-reciprocal re-ranking (batched, fixed-k, masked).

SURVEY.md §7 "hard parts": the set-algebra-heavy reference algorithm
(utils/reranking.py:29-100) reformulated as dense masked linear algebra so
it runs on the TPU:

  * forward top-(k+1) lists → boolean membership matrix F (scatter),
  * k-reciprocal mask R = F ∧ Fᵀ,
  * expansion: E = R ∨ ((R ∧ condᵀ) @ R_half > 0) where cond thresholds the
    |R_half(j) ∩ R(i)| overlap computed as one matmul,
  * V = row-normalized exp(-d) under E; query expansion Vq = G @ V with G
    the top-k2 averaging matrix (another matmul),
  * Jaccard min-sum evaluated in (query-block × gallery-block) tiles under
    ``lax.scan`` to bound memory.

Memory is O(n²) for the masks/V (n = query+gallery); suitable to ~10k
entries per device and shardable over the query axis beyond that. The
numpy (editor_tpu/evals/reranking.py) and native C++ paths remain the
fallbacks for very large galleries on host.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _membership(rank_idx: Array, n: int) -> Array:
    """[n, k] neighbor indices → [n, n] bool membership matrix."""
    k = rank_idx.shape[1]
    rows = jnp.repeat(jnp.arange(n), k)
    flat = jnp.zeros((n, n), jnp.bool_)
    return flat.at[rows, rank_idx.reshape(-1)].set(True)


@functools.partial(jax.jit, static_argnames=("nq", "k1", "k2", "q_block"))
def _rerank_core(original: Array, nq: int, k1: int, k2: int,
                 lambda_value: float, q_block: int = 128) -> Array:
    n = original.shape[0]
    half = int(round(k1 / 2))

    neg = -original
    _, fwd_k1 = jax.lax.top_k(neg, k1 + 1)
    _, fwd_half = jax.lax.top_k(neg, half + 1)
    _, fwd_k2 = jax.lax.top_k(neg, k2)

    F = _membership(fwd_k1, n)
    R = F & F.T
    Fh = _membership(fwd_half, n)
    Rh = Fh & Fh.T

    Rf = R.astype(jnp.float32)
    Rhf = Rh.astype(jnp.float32)
    overlap = Rhf @ Rf.T  # overlap[j, i] = |Rh(j) ∩ R(i)|
    sizes = jnp.sum(Rhf, axis=1, keepdims=True)
    cond = overlap > (2.0 / 3.0) * sizes  # [j, i]
    extra = ((R & cond.T).astype(jnp.float32) @ Rhf) > 0
    E = R | extra

    V = jnp.where(E, jnp.exp(-original), 0.0)
    V = V / jnp.sum(V, axis=1, keepdims=True)

    # local query expansion
    G = _membership(fwd_k2, n).astype(jnp.float32) / k2
    V = G @ V

    # jaccard in query tiles (gallery axis full per tile)
    pad_q = (-nq) % q_block
    orig_q = original[:nq]
    Vq = V[:nq]
    if pad_q:
        Vq = jnp.pad(Vq, [(0, pad_q), (0, 0)])
        orig_q = jnp.pad(orig_q, [(0, pad_q), (0, 0)])
    nt = Vq.shape[0] // q_block
    Vq_t = Vq.reshape(nt, q_block, n)
    orig_t = orig_q.reshape(nt, q_block, n)

    def tile(carry, inp):
        v_tile, o_tile = inp  # [q_block, n]
        minsum = jnp.sum(jnp.minimum(v_tile[:, None, :], V[None, :, :]),
                         axis=-1)  # [q_block, n]
        jac = 1.0 - minsum / (2.0 - minsum)
        return carry, jac * (1.0 - lambda_value) + o_tile * lambda_value

    _, final = jax.lax.scan(tile, None, (Vq_t, orig_t))
    final = final.reshape(-1, n)[:nq, nq:]
    return final


def k_reciprocal_rerank_jax(prob_feat, gal_feat, k1: int = 20, k2: int = 6,
                            lambda_value: float = 0.3) -> np.ndarray:
    """Device-side re-ranking; same contract as the numpy/native versions."""
    feat = jnp.concatenate([jnp.asarray(prob_feat, jnp.float32),
                            jnp.asarray(gal_feat, jnp.float32)], axis=0)
    sq = jnp.sum(feat * feat, axis=1)
    d = jnp.maximum(sq[:, None] + sq[None, :] - 2.0 * feat @ feat.T, 0.0)
    original = (d / jnp.max(d, axis=0, keepdims=True)).T
    nq = prob_feat.shape[0]
    return np.asarray(_rerank_core(original, nq, k1, k2, lambda_value))
