"""Fused self-attention kernel for the ViT backbone (short-sequence regime).

N=129 tokens is far below flash-attention territory: the whole per-head
[N, N] logits tile fits in VMEM, so the wins are layout wins:

  * The kernel consumes the RAW QKV projection output ``[B, N, 3C]`` and
    produces ``[B, N, C]`` ready for the output projection — the usual
    ``[B,N,H,D] -> [B,H,N,D]`` head transposes (and their ~0.7 GB/layer of
    padded HBM round-trips at the flagship batch: D=64 pads to 128 lanes)
    never exist. Heads are peeled off with static 64-lane slices in VMEM.
  * 129 = 1 cls + 128 patch tokens. A [*, 129]-minor tensor pads to 256
    VMEM lanes — 2x wasted VPU softmax work and 2x wasted HBM traffic on
    any stored [N, N] map. Softmax is therefore computed in SPLIT form:
    patch-key logits [*, N, 128] (lane-exact) plus a cls-key column [*, N]
    folded in on the side. Identical math, half the padded footprint. The
    optional probs spill for the attention rollout (ops/rollout.py) is
    stored in the same split form.
  * Dots take bf16 operands with ``preferred_element_type`` fp32 — bf16
    inputs on the MXU with fp32 accumulation. (Casting operands to fp32
    *before* the dot forces multi-pass fp32 MXU emulation, several times
    slower for identical results: bf16·bf16 products are exact in fp32.)

Backward: a Pallas kernel in the same qkv layout (``_qkv_bwd_kernel``)
recomputes the split softmax in VMEM and applies the softmax VJP — the XLA
graph recompute remains the off-TPU fallback under ``jax.custom_vjp``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


# ---------------------------------------------------------------------------
# XLA reference path (CPU tests, backward recompute)
# ---------------------------------------------------------------------------

def _xla_attention_qkv(qkv: Array, num_heads: int, scale: float,
                       with_probs: bool):
    """qkv: [B, N, 3C] -> out [B, N, C] (+ optional split probs)."""
    B, N, C3 = qkv.shape
    C = C3 // 3
    H, D = num_heads, C // num_heads
    qkv5 = qkv.reshape(B, N, 3, H, D)
    q, k, v = qkv5[:, :, 0], qkv5[:, :, 1], qkv5[:, :, 2]  # [B,N,H,D]
    # fp32 softmax/accumulation for bf16/fp32 inputs, fp64 for fp64 (golden)
    cd = jnp.promote_types(qkv.dtype, jnp.float32)
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                        preferred_element_type=cd) * scale
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhnm,bmhd->bnhd", attn.astype(qkv.dtype), v,
                     preferred_element_type=cd)
    out = out.astype(qkv.dtype).reshape(B, N, C)
    if not with_probs:
        return out
    attn = attn.astype(qkv.dtype)
    return out, (attn[:, :, :, 1:], attn[:, :, :, 0])


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _head_split_softmax_av(q, k, v, scale):
    """Split-form softmax(q·kᵀ)·v for one [G, N, D] head (N = 1 cls + P).

    Returns (out [G,N,D] fp32, p_patch [G,N,P] fp32, p_cls [G,N] fp32).

    Row-max-stabilized softmax, like the torch reference: fp32 exp
    overflows past ~88 and a whole row underflowing would divide by zero,
    so raw exp is only safe for |logit| < ~85 — typical for LN-bounded ViT
    activations but not guaranteed mid-training. The max element
    contributes exp(0) = 1, so the denominator is >= 1 and needs no
    epsilon. Costs one lane-reduce sweep per head (~0.1 ms/layer at the
    flagship batch); the subtract fuses into the exp.
    """
    kp = k[:, 1:, :]   # [G, P, D] patch keys
    # patch-key logits on the MXU: [G, N, P] — P=128 is lane-exact
    lp = jax.lax.dot_general(
        q, kp, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    # cls-key column on the VPU: sum_d q[g,n,d] * k[g,0,d] -> [G, N]
    lc = jnp.sum(q.astype(jnp.float32) * k[:, 0:1, :].astype(jnp.float32),
                 axis=-1) * scale
    m = jnp.maximum(jnp.max(lp, axis=-1), lc)  # [G, N] row max
    ep = jnp.exp(lp - m[:, :, None])
    ec = jnp.exp(lc - m)
    inv = 1.0 / (jnp.sum(ep, axis=-1) + ec)  # [G, N]; denom >= 1
    p_patch = ep * inv[:, :, None]
    p_cls = ec * inv
    out = jax.lax.dot_general(
        p_patch.astype(v.dtype), v[:, 1:, :], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    out = out + p_cls[:, :, None] * v[:, 0:1, :].astype(jnp.float32)
    return out, p_patch, p_cls


def _qkv_kernel(qkv_ref, o_ref, *, scale, H, D, with_probs,
                pp_ref=None, pc_ref=None):
    blk = qkv_ref[...]  # [G, N, 3C] bf16, heads packed in lanes
    C = H * D
    outs = []
    for h in range(H):
        q = blk[:, :, h * D:(h + 1) * D]
        k = blk[:, :, C + h * D:C + (h + 1) * D]
        v = blk[:, :, 2 * C + h * D:2 * C + (h + 1) * D]
        out, pph, pch = _head_split_softmax_av(q, k, v, scale)
        outs.append(out.astype(o_ref.dtype))
        if with_probs:
            pp_ref[:, h] = pph.astype(pp_ref.dtype)
            pc_ref[:, h] = pch.astype(pc_ref.dtype)
    o_ref[...] = jnp.concatenate(outs, axis=-1)


def _kernel_probs(qkv_ref, o_ref, pp_ref, pc_ref, *, scale, H, D):
    _qkv_kernel(qkv_ref, o_ref, scale=scale, H=H, D=D, with_probs=True,
                pp_ref=pp_ref, pc_ref=pc_ref)


def _kernel_noprobs(qkv_ref, o_ref, *, scale, H, D):
    _qkv_kernel(qkv_ref, o_ref, scale=scale, H=H, D=D, with_probs=False)


def _pick_group(B: int, group: int) -> int:
    g = group
    while B % g:
        g //= 2
    return max(g, 1)


# ---------------------------------------------------------------------------
# Pallas backward kernel
# ---------------------------------------------------------------------------

def _qkv_bwd_kernel(qkv_ref, g_ref, dqkv_ref, *, scale, H, D):
    """d(softmax(q·kᵀ·scale)·v)/d(qkv): recompute the split softmax in VMEM,
    then the standard softmax VJP, all in the [*, N, 3C] qkv layout."""
    blk = qkv_ref[...]   # [g, N, 3C]
    go = g_ref[...]      # [g, N, C]
    C = H * D
    for h in range(H):
        q = blk[:, :, h * D:(h + 1) * D]
        k = blk[:, :, C + h * D:C + (h + 1) * D]
        v = blk[:, :, 2 * C + h * D:2 * C + (h + 1) * D]
        gh = go[:, :, h * D:(h + 1) * D]          # [g, N, D]
        kp, vp = k[:, 1:, :], v[:, 1:, :]          # [g, P, D]
        # --- recompute split softmax (same math as forward) ---
        lp = jax.lax.dot_general(
            q, kp, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale        # [g, N, P]
        lc = jnp.sum(q.astype(jnp.float32) * k[:, 0:1, :].astype(jnp.float32),
                     axis=-1) * scale                          # [g, N]
        # row-max-stabilized softmax, same form as the forward kernel
        # (_head_split_softmax_av): denom >= 1, overflow-safe
        m = jnp.maximum(jnp.max(lp, axis=-1), lc)
        ep = jnp.exp(lp - m[:, :, None])
        ec = jnp.exp(lc - m)
        inv = 1.0 / (jnp.sum(ep, axis=-1) + ec)
        pp = ep * inv[:, :, None]                              # [g, N, P]
        pc = ec * inv                                          # [g, N]
        ppb = pp.astype(blk.dtype)
        # --- dv: pᵀ @ g ---
        dvp = jax.lax.dot_general(
            ppb, gh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)                # [g, P, D]
        dvc = jnp.sum(pc[:, :, None]
                      * gh.astype(jnp.float32), axis=1)        # [g, D]
        # --- dp = g @ vᵀ ---
        dpp = jax.lax.dot_general(
            gh, vp, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)                # [g, N, P]
        dpc = jnp.sum(gh.astype(jnp.float32)
                      * v[:, 0:1, :].astype(jnp.float32), axis=-1)  # [g, N]
        # --- softmax VJP: dl = p ∘ (dp - Σ dp∘p) ---
        r = jnp.sum(dpp * pp, axis=-1) + dpc * pc              # [g, N]
        dlp = (pp * (dpp - r[:, :, None]) * scale).astype(blk.dtype)
        dlc = pc * (dpc - r) * scale                           # [g, N] fp32
        # --- dq = dl @ k ---
        dq = jax.lax.dot_general(
            dlp, kp, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dq = dq + dlc[:, :, None] * k[:, 0:1, :].astype(jnp.float32)
        # --- dk = dlᵀ @ q ---
        dkp = jax.lax.dot_general(
            dlp, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)                # [g, P, D]
        dkc = jnp.sum(dlc[:, :, None]
                      * q.astype(jnp.float32), axis=1)         # [g, D]
        dt = dqkv_ref.dtype
        dqkv_ref[:, :, h * D:(h + 1) * D] = dq.astype(dt)
        # dk/dv row 0 (cls key) and rows 1..P (patch keys) stored separately
        # (Mosaic cannot lower a sublane concat of [g,1,D] with [g,P,D])
        dqkv_ref[:, 0:1, C + h * D:C + (h + 1) * D] = dkc[:, None, :].astype(dt)
        dqkv_ref[:, 1:, C + h * D:C + (h + 1) * D] = dkp.astype(dt)
        dqkv_ref[:, 0:1, 2 * C + h * D:2 * C + (h + 1) * D] = (
            dvc[:, None, :].astype(dt))
        dqkv_ref[:, 1:, 2 * C + h * D:2 * C + (h + 1) * D] = dvp.astype(dt)


def _pallas_attention_qkv_bwd(qkv: Array, g_out: Array, num_heads: int,
                              scale: float, group: int = 4) -> Array:
    # group=4 measured 4.87 vs 5.75 ms at g=2 for the flagship batch
    import jax.experimental.pallas as pl

    B, N, C3 = qkv.shape
    C = C3 // 3
    H, D = num_heads, C // num_heads
    g = _pick_group(B, group)
    dqkv = pl.pallas_call(
        functools.partial(_qkv_bwd_kernel, scale=scale, H=H, D=D),
        out_shape=jax.ShapeDtypeStruct((B, N, C3), qkv.dtype),
        grid=(B // g,),
        in_specs=[pl.BlockSpec((g, N, C3), lambda i: (i, 0, 0)),
                  pl.BlockSpec((g, N, C), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((g, N, C3), lambda i: (i, 0, 0)),
    )(qkv, g_out)
    return dqkv


def _pallas_attention_qkv(qkv: Array, num_heads: int, scale: float,
                          with_probs: bool, group: int = 4):
    import jax.experimental.pallas as pl

    B, N, C3 = qkv.shape
    C = C3 // 3
    H, D = num_heads, C // num_heads
    P = N - 1
    g = _pick_group(B, group)
    grid = (B // g,)
    in_specs = [pl.BlockSpec((g, N, C3), lambda i: (i, 0, 0))]
    if with_probs:
        out, pp, pc = pl.pallas_call(
            functools.partial(_kernel_probs, scale=scale, H=H, D=D),
            out_shape=(jax.ShapeDtypeStruct((B, N, C), qkv.dtype),
                       jax.ShapeDtypeStruct((B, H, N, P), qkv.dtype),
                       jax.ShapeDtypeStruct((B, H, N), qkv.dtype)),
            grid=grid,
            in_specs=in_specs,
            out_specs=(pl.BlockSpec((g, N, C), lambda i: (i, 0, 0)),
                       pl.BlockSpec((g, H, N, P), lambda i: (i, 0, 0, 0)),
                       pl.BlockSpec((g, H, N), lambda i: (i, 0, 0))),
        )(qkv)
        return out, (pp, pc)
    out = pl.pallas_call(
        functools.partial(_kernel_noprobs, scale=scale, H=H, D=D),
        out_shape=jax.ShapeDtypeStruct((B, N, C), qkv.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((g, N, C), lambda i: (i, 0, 0)),
    )(qkv)
    return out


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def attention_from_qkv(qkv: Array, num_heads: int, scale: float) -> Array:
    """Multi-head softmax attention from the raw QKV projection.

    qkv: [B, N, 3C] laid out [q_h0..q_hH | k_h0.. | v_h0..] (the natural
    ``x @ W_qkv`` output). Returns [B, N, C].
    """
    if jax.default_backend() == "tpu":
        return _pallas_attention_qkv(qkv, num_heads, scale, with_probs=False)
    return _xla_attention_qkv(qkv, num_heads, scale, with_probs=False)


def _fwd(qkv, num_heads, scale):
    return attention_from_qkv(qkv, num_heads, scale), qkv


def _bwd(num_heads, scale, qkv, grad):
    if jax.default_backend() == "tpu":
        return (_pallas_attention_qkv_bwd(qkv, grad, num_heads, scale),)
    _, vjp = jax.vjp(
        lambda t: _xla_attention_qkv(t, num_heads, scale, with_probs=False),
        qkv)
    return vjp(grad)


attention_from_qkv.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def attention_from_qkv_probs(qkv: Array, num_heads: int, scale: float
                             ) -> Tuple[Array, Tuple[Array, Array]]:
    """Like :func:`attention_from_qkv` but also returns the post-softmax
    probabilities in split form ``(p_patch [B,H,N,N-1], p_cls [B,H,N])``
    (in qkv.dtype) for the rollout chain (editor_tpu/ops/rollout.py).

    The probs output is GRADIENT-FREE: its cotangent is discarded by the
    custom VJP (it only ever feeds the discrete top-k token selection, which
    has no gradient — callers must not differentiate through it).
    """
    if jax.default_backend() == "tpu":
        return _pallas_attention_qkv(qkv, num_heads, scale, with_probs=True)
    return _xla_attention_qkv(qkv, num_heads, scale, with_probs=True)


def _fwd_probs(qkv, num_heads, scale):
    return attention_from_qkv_probs(qkv, num_heads, scale), qkv


def _bwd_probs(num_heads, scale, qkv, grads):
    g_out, _g_probs = grads  # probs cotangent intentionally dropped (top-k)
    if jax.default_backend() == "tpu":
        return (_pallas_attention_qkv_bwd(qkv, g_out, num_heads, scale),)
    _, vjp = jax.vjp(
        lambda t: _xla_attention_qkv(t, num_heads, scale, with_probs=False),
        qkv)
    return vjp(g_out)


attention_from_qkv_probs.defvjp(_fwd_probs, _bwd_probs)
