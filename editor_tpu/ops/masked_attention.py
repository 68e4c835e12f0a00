"""Fused masked attention for the HMA fusion block.

The hot op behind ``AttentionMask`` (reference: vit_pytorch.py:240-258): given
per-token boolean masks, attention logits are filled with -65504 where
``mask_q & mask_k`` is false, softmaxed, and rows re-multiplied by the query
mask. The reference materializes the [B,H,N,N] mask outer product and calls
``masked_fill`` (separate cuDNN kernels); here a single Pallas kernel keeps
q/k/v + logits in VMEM, fuses the bias/softmax/re-mask, and hits the MXU for
both matmuls. An XLA fallback (identical numerics) covers CPU tests and the
backward pass (the kernel wraps the fallback via ``jax.custom_vjp`` residual
recompute when differentiated — forward-only inference uses the kernel).

N for EDITOR fusion is 3·(1+128)=387; the wrapper zero-pads the token axis to
a lane-friendly multiple and the padded rows are exactly zeroed by the mask
algebra (padded queries: uniform softmax × mask 0 → 0).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def _xla_masked_attention(q: Array, k: Array, v: Array, mask: Array,
                          scale: float, mask_fill: float) -> Array:
    """Reference-exact masked attention. q/k/v: [B,H,N,D], mask: [B,N]."""
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                        preferred_element_type=jnp.float32) * scale
    m = mask.astype(jnp.float32)
    pair = m[:, None, :, None] * m[:, None, None, :]  # [B,1,N,N]
    logits = jnp.where(pair == 0, mask_fill, logits.astype(jnp.float32))
    attn = jax.nn.softmax(logits, axis=-1)
    attn = attn * m[:, None, :, None]  # re-mask query rows
    out = jnp.einsum("bhnm,bhmd->bhnd", attn.astype(q.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def _pallas_kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, *, scale, mask_fill):
    # batched over the G (batch·head) pairs of this grid step
    q = q_ref[...].astype(jnp.float32)  # [G, N, D]
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...]
    m = mask_ref[...].astype(jnp.float32)  # [G, 1, N]
    logits = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale  # [G, N, N]
    pair = m.transpose(0, 2, 1) * m  # [G, N, N] (query-row x key-col mask)
    logits = jnp.where(pair == 0.0, mask_fill, logits)
    logits = logits - jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits)
    attn = e / jnp.sum(e, axis=-1, keepdims=True)
    attn = attn * m.transpose(0, 2, 1)  # re-mask query rows
    out = jax.lax.dot_general(
        attn.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    out_ref[...] = out.astype(out_ref.dtype)


def _pallas_masked_attention(q: Array, k: Array, v: Array, mask: Array,
                             scale: float, mask_fill: float,
                             interpret: bool = False,
                             group: int = 8) -> Array:
    import jax.experimental.pallas as pl

    B, H, N, D = q.shape
    # blocks carry the full token axis, so it only needs sublane (8) alignment
    pad_n = (-N) % 8
    if pad_n:
        zpad = [(0, 0), (0, 0), (0, pad_n), (0, 0)]
        q = jnp.pad(q, zpad)
        k = jnp.pad(k, zpad)
        v = jnp.pad(v, zpad)
        mask = jnp.pad(mask, [(0, 0), (0, pad_n)])
    Np = N + pad_n
    Z = B * H
    g = group
    while Z % g:
        g //= 2
    qf = q.reshape(Z, Np, D)
    kf = k.reshape(Z, Np, D)
    vf = v.reshape(Z, Np, D)
    mf = jnp.repeat(mask, H, axis=0)[:, None, :]  # [Z, 1, Np]

    kernel = functools.partial(_pallas_kernel, scale=scale, mask_fill=mask_fill)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Z, Np, D), q.dtype),
        grid=(Z // g,),
        in_specs=[
            pl.BlockSpec((g, Np, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, Np, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, Np, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, 1, Np), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((g, Np, D), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(qf, kf, vf, mf)
    out = out.reshape(B, H, Np, D)
    return out[:, :, :N, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _masked_attention_tpu(q, k, v, mask, scale, mask_fill):
    return _pallas_masked_attention(q, k, v, mask, scale, mask_fill)


def _fwd(q, k, v, mask, scale, mask_fill):
    out = _pallas_masked_attention(q, k, v, mask, scale, mask_fill)
    return out, (q, k, v, mask)


def _bwd(scale, mask_fill, res, g):
    q, k, v, mask = res
    # recompute-based backward through the XLA path (identical math)
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _xla_masked_attention(q_, k_, v_, mask, scale, mask_fill),
        q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_masked_attention_tpu.defvjp(_fwd, _bwd)


def masked_attention(q: Array, k: Array, v: Array, mask: Array,
                     scale: float, mask_fill: float = -65504.0,
                     use_pallas: bool = True) -> Array:
    """Masked attention. q/k/v: [B, H, N, D]; mask: [B, N] (1=keep).

    ``use_pallas`` selects the fused TPU kernel when running on TPU; any other
    backend (or ``use_pallas=False``) uses the XLA graph with identical
    numerics.
    """
    on_tpu = jax.default_backend() == "tpu"
    if use_pallas and on_tpu:
        return _masked_attention_tpu(q, k, v, mask, scale, mask_fill)
    return _xla_masked_attention(q, k, v, mask, scale, mask_fill)
