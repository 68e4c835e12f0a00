"""Attention rollout: cls-row of the chain product of per-layer attention maps.

The SFTS mask needs row0 of P = A_L @ ... @ A_1 (reference Part_Attention,
SFTS.py:145-153). The backbone's fused attention kernel already computes each
layer's probabilities in VMEM; it spills them once in SPLIT form — patch-key
columns [*, N, 128] (lane-exact bf16 tiles) plus the cls-key column [*, N] —
and this module reduces the stack with a reverse *vector* chain
v <- v . A_i: L·N² flops instead of re-running L softmax(QKᵀ) products, and
~2 GB of clean HBM reads instead of ~4 GB of 129→256-lane-padded ones.

The chain state is carried split as (v_cls scalar, v_patch [1, 128]) so no
[*, 129]-minor tensor is ever materialized; the final result IS the patch
part — exactly what Part_Attention consumes (``last_map[:, :, 0, 1:]``).

Gradient-free by construction (the rollout only feeds a discrete top-k), so
inputs are stop_gradient-ed here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


def rollout_from_probs(probs: Array) -> Array:
    """Full-map chain (CPU/XLA path + test oracle).

    probs: [L, B, H, N, N] per-layer post-softmax attention maps
    (row = query). Returns the fp32 [B, H, N-1] rollout cls-row over patch
    tokens: row0 of A_{L-1} @ ... @ A_0 (reference chain order:
    ``last_map = att[i] @ last_map``, SFTS.py:148-152).
    """
    probs = jax.lax.stop_gradient(probs)
    cd = jnp.promote_types(probs.dtype, jnp.float32)
    # cls row of the last layer's map seeds the chain: e0ᵀ A_{L-1}
    v = probs[-1][:, :, 0, :].astype(cd)  # [B, H, N]

    def body(v, a):
        return jnp.einsum("bhn,bhnm->bhm", v, a.astype(cd),
                          preferred_element_type=cd), None

    v, _ = jax.lax.scan(body, v, probs[:-1], reverse=True)
    return v[:, :, 1:]


def _chain_kernel(pp_ref, pc_ref, o_ref, vc_ref, *, L):
    """One inner-grid step of the reverse chain for G (b·h) pairs.

    pp_ref: [1, G, N, P] this step's patch-key probs (layer L-1-l),
    pc_ref: [1, G, N] its cls-key column, o_ref: [G, 1, P] resident
    v_patch accumulator, vc_ref: [G, 1] v_cls scratch.
    With A = [cls_col | patch_cols]: v' = v·A splits into
      v'_cls   = v_cls·A[0,0]  + Σ_p v_patch[p]·A[1+p,0]
      v'_patch = v_cls·A[0,1:] + v_patch @ A[1:,1:]
    """
    import jax.experimental.pallas as pl

    l = pl.program_id(1)
    ap = pp_ref[0]  # [G, N, P]
    ac = pc_ref[0]  # [G, N]

    @pl.when(l == 0)
    def _seed():
        # row 0 of the LAST layer's map
        o_ref[...] = ap[:, 0:1, :].astype(jnp.float32)
        vc_ref[...] = ac[:, 0:1].astype(jnp.float32)

    @pl.when(l > 0)
    def _step():
        vp = o_ref[...]              # [G, 1, P] fp32
        vc = vc_ref[...]             # [G, 1] fp32
        apf = ap.astype(jnp.float32)
        acf = ac.astype(jnp.float32)
        new_vc = (vc[:, 0] * acf[:, 0]
                  + jnp.sum(vp[:, 0, :] * acf[:, 1:], axis=-1))  # [G]
        new_vp = (vc[:, :, None] * apf[:, 0:1, :]
                  + jax.lax.dot_general(
                      vp, apf[:, 1:, :], (((2,), (1,)), ((0,), (0,))),
                      preferred_element_type=jnp.float32))
        o_ref[...] = new_vp
        vc_ref[...] = new_vc[:, None]


def _pallas_chain_split(pp: Array, pc: Array, group: int = 64) -> Array:
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L, B, H, N, P = pp.shape
    Z = B * H
    # Mosaic requires the block's second-minor dim (g for the [1, g, N]
    # cls-column spec) to be a multiple of 8 or span the whole axis; pick
    # the largest qualifying divisor of Z, else run the axis unsplit
    # (batch-1 serving: Z = 36 has no 8-multiple divisor)
    g = Z
    for cand in range(min(group, Z), 0, -1):
        if Z % cand == 0 and cand % 8 == 0:
            g = cand
            break
    ppf = pp.reshape(L, Z, N, P)
    pcf = pc.reshape(L, Z, N)
    out = pl.pallas_call(
        functools.partial(_chain_kernel, L=L),
        out_shape=jax.ShapeDtypeStruct((Z, 1, P), jnp.float32),
        grid=(Z // g, L),
        in_specs=[
            pl.BlockSpec((1, g, N, P), lambda i, l: (L - 1 - l, i, 0, 0)),
            pl.BlockSpec((1, g, N), lambda i, l: (L - 1 - l, i, 0)),
        ],
        out_specs=pl.BlockSpec((g, 1, P), lambda i, l: (i, 0, 0)),
        scratch_shapes=[pltpu.VMEM((g, 1), jnp.float32)],
    )(ppf, pcf)
    return out.reshape(B, H, P)


def rollout_from_split_probs(pp: Array, pc: Array) -> Array:
    """Split-form chain. pp: [L, B, H, N, N-1] patch-key probs; pc:
    [L, B, H, N] cls-key column (both per-layer post-softmax rows).
    Returns fp32 [B, H, N-1] — the patch part of the rollout cls row.
    """
    pp = jax.lax.stop_gradient(pp)
    pc = jax.lax.stop_gradient(pc)
    if jax.default_backend() == "tpu":
        return _pallas_chain_split(pp, pc)
    # reassemble full maps (non-TPU fallback; tiny shapes in tests)
    probs = jnp.concatenate([pc[..., None], pp], axis=-1)
    return rollout_from_probs(probs)
