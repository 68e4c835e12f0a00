"""Microbench: fully-fused attention half-layer kernel.

mid = proj(attention(LN(x))) in ONE Pallas kernel (weights resident),
vs the shipped LN(XLA) + qkv-matmul(XLA) + attention(Pallas) + proj(XLA).
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=30, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    return (time.perf_counter() - t0) / iters * 1000.0


def _attn_layer_kernel(x_ref, lnw_ref, lnb_ref, wqkv_ref, bqkv_ref,
                       wp_ref, bp_ref, o_ref, *, scale, H, D, eps,
                       with_probs, pp_ref=None, pc_ref=None):
    xb = x_ref[...]                               # [g, N, C] bf16
    xf = xb.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = (y * lnw_ref[...].astype(jnp.float32)
         + lnb_ref[...].astype(jnp.float32)).astype(xb.dtype)
    qkv = jax.lax.dot_general(
        y, wqkv_ref[...], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[...].astype(jnp.float32)).astype(xb.dtype)
    C = H * D
    outs = []
    for h in range(H):
        q = qkv[:, :, h * D:(h + 1) * D]
        k = qkv[:, :, C + h * D:C + (h + 1) * D]
        v = qkv[:, :, 2 * C + h * D:2 * C + (h + 1) * D]
        kp = k[:, 1:, :]
        lp = jax.lax.dot_general(q, kp, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32) * scale
        lc = jnp.sum(q.astype(jnp.float32) * k[:, 0:1, :].astype(jnp.float32),
                     axis=-1) * scale
        m = jnp.maximum(jnp.max(lp, axis=-1), lc)
        ep = jnp.exp(lp - m[:, :, None])
        ec = jnp.exp(lc - m)
        inv = 1.0 / (jnp.sum(ep, axis=-1) + ec)
        pp = ep * inv[:, :, None]
        pc = ec * inv
        out = jax.lax.dot_general(pp.astype(v.dtype), v[:, 1:, :],
                                  (((2,), (1,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32)
        out = out + pc[:, :, None] * v[:, 0:1, :].astype(jnp.float32)
        outs.append(out.astype(xb.dtype))
        if with_probs:
            pp_ref[:, h] = pp.astype(pp_ref.dtype)
            pc_ref[:, h] = pc.astype(pc_ref.dtype)
    att = jnp.concatenate(outs, axis=-1)          # [g, N, C] bf16
    mid = jax.lax.dot_general(att, wp_ref[...], (((2,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[...] = (mid + bp_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def attn_layer(x, lnw, lnb, wqkv, bqkv, wp, bp, H, scale, eps, g,
               with_probs):
    import jax.experimental.pallas as pl

    B, N, C = x.shape
    P = N - 1
    const = lambda *dims: (lambda i: tuple(0 for _ in dims))
    in_specs = [
        pl.BlockSpec((g, N, C), lambda i: (i, 0, 0)),
        pl.BlockSpec((C,), lambda i: (0,)),
        pl.BlockSpec((C,), lambda i: (0,)),
        pl.BlockSpec((C, 3 * C), lambda i: (0, 0)),
        pl.BlockSpec((3 * C,), lambda i: (0,)),
        pl.BlockSpec((C, C), lambda i: (0, 0)),
        pl.BlockSpec((C,), lambda i: (0,)),
    ]
    kern = functools.partial(_attn_layer_kernel, scale=scale, H=H,
                             D=C // H, eps=eps, with_probs=with_probs)
    if with_probs:
        return pl.pallas_call(
            kern,
            out_shape=(jax.ShapeDtypeStruct((B, N, C), x.dtype),
                       jax.ShapeDtypeStruct((B, H, N, P), x.dtype),
                       jax.ShapeDtypeStruct((B, H, N), x.dtype)),
            grid=(B // g,),
            in_specs=in_specs,
            out_specs=(pl.BlockSpec((g, N, C), lambda i: (i, 0, 0)),
                       pl.BlockSpec((g, H, N, P), lambda i: (i, 0, 0, 0)),
                       pl.BlockSpec((g, H, N), lambda i: (i, 0, 0))),
        )(x, lnw, lnb, wqkv, bqkv, wp, bp)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, N, C), x.dtype),
        grid=(B // g,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((g, N, C), lambda i: (i, 0, 0)),
    )(x, lnw, lnb, wqkv, bqkv, wp, bp)


def main():
    B, N, C, H = 384, 129, 768, 12
    scale = (C // H) ** -0.5
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, N, C) * 0.5, jnp.bfloat16)
    lnw = jnp.asarray(rng.rand(C) + 0.5, jnp.bfloat16)
    lnb = jnp.asarray(rng.randn(C) * 0.1, jnp.bfloat16)
    wqkv = jnp.asarray(rng.randn(C, 3 * C) * 0.03, jnp.bfloat16)
    bqkv = jnp.asarray(rng.randn(3 * C) * 0.02, jnp.bfloat16)
    wp = jnp.asarray(rng.randn(C, C) * 0.03, jnp.bfloat16)
    bp = jnp.asarray(rng.randn(C) * 0.02, jnp.bfloat16)

    # reference composition: XLA LN+matmuls with the shipped Pallas attention
    from editor_tpu.ops.fused_attention import (attention_from_qkv,
                                                attention_from_qkv_probs)

    def composed(x):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        y = ((xf - mu) * jax.lax.rsqrt(var + 1e-6)
             * lnw.astype(jnp.float32) + lnb.astype(jnp.float32)
             ).astype(x.dtype)
        qkv = y @ wqkv + bqkv.astype(x.dtype)
        out = attention_from_qkv(qkv, H, scale)
        return out @ wp + bp.astype(x.dtype)

    def composed_probs(x):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        y = ((xf - mu) * jax.lax.rsqrt(var + 1e-6)
             * lnw.astype(jnp.float32) + lnb.astype(jnp.float32)
             ).astype(x.dtype)
        qkv = y @ wqkv + bqkv.astype(x.dtype)
        out, probs = attention_from_qkv_probs(qkv, H, scale)
        return out @ wp + bp.astype(x.dtype), probs

    want = np.asarray(jax.jit(composed)(x), np.float32)
    t = timeit(jax.jit(composed), x)
    print(f"composed (XLA+attn kernel) noprobs : {t:7.3f} ms", flush=True)
    t = timeit(jax.jit(composed_probs), x)
    print(f"composed (XLA+attn kernel) probs   : {t:7.3f} ms", flush=True)

    for wpb in (False, True):
        for g in (2, 4):
            try:
                fn = jax.jit(functools.partial(
                    attn_layer, H=H, scale=scale, eps=1e-6, g=g,
                    with_probs=wpb))
                got = fn(x, lnw, lnb, wqkv, bqkv, wp, bp)
                o = np.asarray(got[0] if wpb else got, np.float32)
                rel = np.abs(o - want).max() / np.abs(want).max()
                t = timeit(fn, x, lnw, lnb, wqkv, bqkv, wp, bp)
                print(f"fused layer probs={int(wpb)} g={g}: {t:7.3f} ms "
                      f"relerr={rel:.2e}", flush=True)
            except Exception as e:
                print(f"fused layer probs={int(wpb)} g={g}: FAIL "
                      f"{type(e).__name__} {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
