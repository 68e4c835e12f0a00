"""Microbench: attention kernel redesigns at backbone shapes (B=384, N=129).

Variants:
  cur      — shipped kernel (qkv block, in-VMEM head slicing)
  headgrid — q,k,v as separate arrays; grid (batch, head); BlockSpec slices
             the D=64 head lanes (DMA-side gather, no register relayout)
  head2    — same but two heads per step (128-lane blocks)
  xla      — plain XLA einsum path
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


def _split_softmax_av(q, k, v, scale):
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
    return out + pc[:, :, None] * v[:, 0:1, :].astype(jnp.float32), pp, pc


def _headgrid_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, with_probs,
                     pp_ref=None, pc_ref=None, heads_per_step=1):
    D = q_ref.shape[-1] // heads_per_step
    for j in range(heads_per_step):
        q = q_ref[..., j * D:(j + 1) * D]
        k = k_ref[..., j * D:(j + 1) * D]
        v = v_ref[..., j * D:(j + 1) * D]
        out, pp, pc = _split_softmax_av(q, k, v, scale)
        o_ref[..., j * D:(j + 1) * D] = out.astype(o_ref.dtype)
        if with_probs:
            pp_ref[:, j] = pp.astype(pp_ref.dtype)
            pc_ref[:, j] = pc.astype(pc_ref.dtype)


def headgrid_attn(q, k, v, H, scale, g, with_probs, hps=1):
    import jax.experimental.pallas as pl

    B, N, C = q.shape
    D = C // H
    P = N - 1
    Dh = D * hps
    grid = (B // g, H // hps)
    qspec = pl.BlockSpec((g, N, Dh), lambda i, h: (i, 0, h))
    if with_probs:
        out, pp, pc = pl.pallas_call(
            functools.partial(_headgrid_kernel, scale=scale, with_probs=True,
                              heads_per_step=hps),
            out_shape=(jax.ShapeDtypeStruct((B, N, C), q.dtype),
                       jax.ShapeDtypeStruct((B, H, N, P), q.dtype),
                       jax.ShapeDtypeStruct((B, H, N), q.dtype)),
            grid=grid,
            in_specs=[qspec, qspec, qspec],
            out_specs=(pl.BlockSpec((g, N, Dh), lambda i, h: (i, 0, h)),
                       pl.BlockSpec((g, hps, N, P), lambda i, h: (i, h, 0, 0)),
                       pl.BlockSpec((g, hps, N), lambda i, h: (i, h, 0))),
        )(q, k, v)
        return out, pp, pc
    out = pl.pallas_call(
        functools.partial(_headgrid_kernel, scale=scale, with_probs=False,
                          heads_per_step=hps),
        out_shape=jax.ShapeDtypeStruct((B, N, C), q.dtype),
        grid=grid,
        in_specs=[qspec, qspec, qspec],
        out_specs=pl.BlockSpec((g, N, Dh), lambda i, h: (i, 0, h)),
    )(q, k, v)
    return out


def main():
    B, N, C, H = 384, 129, 768, 12
    scale = (C // H) ** -0.5
    rng = np.random.RandomState(0)
    qkv = jnp.asarray(rng.randn(B, N, 3 * C), jnp.bfloat16)
    q = qkv[:, :, :C]
    k = qkv[:, :, C:2 * C]
    v = qkv[:, :, 2 * C:]

    from editor_tpu.ops import fused_attention as FA
    want = np.asarray(jax.jit(functools.partial(
        FA._pallas_attention_qkv, num_heads=H, scale=scale,
        with_probs=False))(qkv), np.float32)

    for wp in (False, True):
        for hps in (1, 2):
            for g in (8, 16, 32):
                try:
                    fn = jax.jit(functools.partial(
                        headgrid_attn, H=H, scale=scale, g=g,
                        with_probs=wp, hps=hps))
                    got = fn(q, k, v)
                    o = np.asarray(got[0] if wp else got, np.float32)
                    rel = np.abs(o - want).max() / np.abs(want).max()
                    t = timeit(fn, q, k, v)
                    print(f"headgrid probs={int(wp)} hps={hps} g={g:3d}: "
                          f"{t:7.3f} ms relerr={rel:.2e}", flush=True)
                except Exception as e:
                    print(f"headgrid probs={int(wp)} hps={hps} g={g:3d}: FAIL "
                          f"{type(e).__name__} {str(e)[:90]}", flush=True)

    t = timeit(jax.jit(functools.partial(
        FA._xla_attention_qkv, num_heads=H, scale=scale, with_probs=False)),
        qkv)
    print(f"xla nopro: {t:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
