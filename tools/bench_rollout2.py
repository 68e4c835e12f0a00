"""Microbench round 2: multi-layer chain steps + probs-kernel group tuning."""

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


def multi_kernel(pp_ref, pc_ref, o_ref, vc_ref, *, T):
    """T layers per grid step; blocks ordered so step s covers layers
    [L-T*(s+1), L-T*s) and we iterate t from the TOP layer down."""
    import jax.experimental.pallas as pl

    s = pl.program_id(1)

    @pl.when(s == 0)
    def _seed():
        ap = pp_ref[T - 1]
        ac = pc_ref[T - 1]
        o_ref[...] = ap[:, 0:1, :].astype(jnp.float32)
        vc_ref[...] = ac[:, 0:1].astype(jnp.float32)

    def step(t):
        ap = pp_ref[t]   # [G, N, P]
        ac = pc_ref[t]   # [G, N]
        vp = o_ref[...]
        vc = vc_ref[...]
        acf = ac.astype(jnp.float32)
        new_vc = (vc[:, 0] * acf[:, 0]
                  + jnp.sum(vp[:, 0, :] * acf[:, 1:], axis=-1))
        new_vp = (vc[:, :, None] * ap[:, 0:1, :].astype(jnp.float32)
                  + jax.lax.dot_general(
                      vp.astype(jnp.bfloat16), ap[:, 1:, :],
                      (((2,), (1,)), ((0,), (0,))),
                      preferred_element_type=jnp.float32))
        o_ref[...] = new_vp
        vc_ref[...] = new_vc[:, None]

    for t in range(T - 2, -1, -1):
        pl.when(s == 0)(lambda t=t: step(t))
    for t in range(T - 1, -1, -1):
        pl.when(s > 0)(lambda t=t: step(t))


def chain_multi(pp, pc, g, T):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L, B, H, N, P = pp.shape
    Z = B * H
    while Z % g:
        g //= 2
    S = L // T
    ppf = pp.reshape(L, Z, N, P)
    pcf = pc.reshape(L, Z, N)
    out = pl.pallas_call(
        functools.partial(multi_kernel, T=T),
        out_shape=jax.ShapeDtypeStruct((Z, 1, P), jnp.float32),
        grid=(Z // g, S),
        in_specs=[
            pl.BlockSpec((T, g, N, P), lambda i, s: (S - 1 - s, i, 0, 0)),
            pl.BlockSpec((T, g, N), lambda i, s: (S - 1 - s, i, 0)),
        ],
        out_specs=pl.BlockSpec((g, 1, P), lambda i, s: (i, 0, 0)),
        scratch_shapes=[pltpu.VMEM((g, 1), jnp.float32)],
    )(ppf, pcf)
    return out.reshape(B, H, P)


def main():
    L, B, H, N = 12, 128, 12, 129
    P = N - 1
    rng = np.random.RandomState(0)
    pp = jnp.asarray(rng.rand(L, B, H, N, P), jnp.bfloat16)
    pc = jnp.asarray(rng.rand(L, B, H, N), jnp.bfloat16)

    from editor_tpu.ops.rollout import rollout_from_probs
    probs = jnp.concatenate([pc[..., None], pp], axis=-1)
    want = np.asarray(jax.jit(rollout_from_probs)(probs.astype(jnp.float32)))

    for T in (2, 3, 4, 6):
        for g in (16, 32, 64):
            try:
                fn = jax.jit(functools.partial(chain_multi, g=g, T=T))
                got = np.asarray(fn(pp, pc))
                rel = np.abs(got - want).max() / np.abs(want).max()
                t = timeit(fn, pp, pc)
                print(f"multi T={T} g={g:3d}: {t:7.3f} ms relerr={rel:.2e}",
                      flush=True)
            except Exception as e:
                print(f"multi T={T} g={g:3d}: FAIL {type(e).__name__} "
                      f"{str(e)[:100]}", flush=True)

    # --- probs-spilling attention kernel group sweep (backbone shapes) ----
    from editor_tpu.ops import fused_attention as FA
    B2, N2, C = 384, 129, 768
    qkv = jnp.asarray(rng.randn(B2, N2, 3 * C), jnp.bfloat16)
    for g in (2, 4, 8):
        try:
            fn = jax.jit(functools.partial(
                FA._pallas_attention_qkv, num_heads=12, scale=0.125,
                with_probs=True, group=g))
            t = timeit(fn, qkv)
            print(f"attn probs g={g}: {t:7.3f} ms", flush=True)
        except Exception as e:
            print(f"attn probs g={g}: FAIL {type(e).__name__} {str(e)[:100]}",
                  flush=True)
    for g in (2, 4, 8):
        try:
            fn = jax.jit(functools.partial(
                FA._pallas_attention_qkv, num_heads=12, scale=0.125,
                with_probs=False, group=g))
            t = timeit(fn, qkv)
            print(f"attn nopro g={g}: {t:7.3f} ms", flush=True)
        except Exception as e:
            print(f"attn nopro g={g}: FAIL {type(e).__name__} {str(e)[:100]}",
                  flush=True)


if __name__ == "__main__":
    main()
