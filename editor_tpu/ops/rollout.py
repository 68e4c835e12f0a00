"""Attention-rollout kernel: cls-row of the chain product of per-layer
attention maps, recomputed from stored (q, k).

The SFTS mask needs row0 of P = A_L @ ... @ A_1 (reference Part_Attention,
SFTS.py:145-153). Materializing L full [B,H,N,N] probability maps costs
~1 GB of HBM traffic per tri-modal batch; instead the backbone saves the
per-layer (q, k) tensors (L·2·N·D ≪ L·N² elements) and this kernel
recomputes each layer's softmax ON-CHIP while running the reverse vector
chain v ← v·A_i — one [N,N] logits tile in VMEM at a time, nothing written
back to HBM but the final [B,H,P] row.

Gradient-free by construction (the rollout feeds a discrete top-k), so no
VJP is needed — callers wrap in stop_gradient.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


def _xla_rollout(qs: Array, ks: Array, scale: float) -> Array:
    """Reference implementation: qs/ks [L, B, H, N, D] → [B, H, N-1]."""
    L = qs.shape[0]
    cd = jnp.promote_types(qs.dtype, jnp.float32)
    logits = jnp.einsum("bhnd,bhmd->bhnm", qs[-1], ks[-1],
                        preferred_element_type=cd) * scale
    v = jax.nn.softmax(logits[:, :, 0, :].astype(cd), axis=-1)  # cls row of A_L

    def body(v, qk):
        q, k = qk
        logits = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                            preferred_element_type=cd) * scale
        a = jax.nn.softmax(logits.astype(cd), axis=-1)
        return jnp.einsum("bhn,bhnm->bhm", v, a,
                          preferred_element_type=cd), None

    v, _ = jax.lax.scan(body, v, (qs[:-1], ks[:-1]), reverse=True)
    return v[:, :, 1:]


def _rollout_kernel(q_ref, k_ref, out_ref, *, scale, num_layers, group):
    # q_ref/k_ref: [L, G, N, D] for G (b·h) pairs; out_ref: [G, 1, N]
    def softmaxed(l):
        q = q_ref[l].astype(jnp.float32)  # [G, N, D]
        k = k_ref[l].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale  # [G, N, N]
        logits = logits - jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits)
        return e / jnp.sum(e, axis=-1, keepdims=True)

    # last layer: only the cls ROW of A_L is needed — [G,1,D]·[G,N,D]ᵀ
    q0 = q_ref[num_layers - 1][:, 0:1, :].astype(jnp.float32)
    kL = k_ref[num_layers - 1].astype(jnp.float32)
    l0 = jax.lax.dot_general(
        q0, kL, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale  # [G, 1, N]
    l0 = l0 - jnp.max(l0, axis=-1, keepdims=True)
    e0 = jnp.exp(l0)
    v = e0 / jnp.sum(e0, axis=-1, keepdims=True)  # [G, 1, N] cls rows

    def body(i, v):
        a = softmaxed(num_layers - 2 - i)
        return jax.lax.dot_general(v, a, (((2,), (1,)), ((0,), (0,))),
                                   preferred_element_type=jnp.float32)

    v = jax.lax.fori_loop(0, num_layers - 1, body, v)
    out_ref[...] = v


def _pallas_rollout(qs: Array, ks: Array, scale: float,
                    group: int = 8) -> Array:
    import jax.experimental.pallas as pl

    L, B, H, N, D = qs.shape
    Z = B * H
    g = group
    while Z % g:
        g //= 2
    qf = qs.reshape(L, Z, N, D)
    kf = ks.reshape(L, Z, N, D)
    kernel = functools.partial(_rollout_kernel, scale=scale, num_layers=L,
                               group=g)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Z, 1, N), jnp.float32),
        grid=(Z // g,),
        in_specs=[
            pl.BlockSpec((L, g, N, D), lambda i: (0, i, 0, 0)),
            pl.BlockSpec((L, g, N, D), lambda i: (0, i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((g, 1, N), lambda i: (i, 0, 0)),
    )(qf, kf)
    return out.reshape(B, H, N)[:, :, 1:]


def attention_rollout(qs: Array, ks: Array, scale: float,
                      use_pallas: bool = False) -> Array:
    """qs/ks: [L, B, H, N, D] per-layer queries/keys (pre-softmax, pre-scale).
    Returns the fp32 [B, H, N-1] rollout cls-row over patch tokens.

    Default path is the XLA recompute chain: measured faster than the
    per-(b,h) Pallas kernel (grid of 2304 tiny M=1 matmuls under-feeds the
    MXU), while still avoiding the L stacked prob maps in HBM.
    """
    import os
    qs = jax.lax.stop_gradient(qs)
    ks = jax.lax.stop_gradient(ks)
    choice = os.environ.get("EDITOR_TPU_ROLLOUT", "pallas" if use_pallas else "xla")
    if choice == "pallas" and jax.default_backend() == "tpu":
        return _pallas_rollout(qs, ks, scale)
    return _xla_rollout(qs, ks, scale)
