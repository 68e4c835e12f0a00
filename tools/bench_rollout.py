"""Microbench: rollout chain kernel variants on the live chip.

Usage: python tools/bench_rollout.py
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


def variant_kernel(pp_ref, pc_ref, o_ref, vc_ref, *, how):
    import jax.experimental.pallas as pl

    l = pl.program_id(1)
    ap = pp_ref[0]  # [G, N, P] bf16
    ac = pc_ref[0]  # [G, N] bf16

    @pl.when(l == 0)
    def _seed():
        o_ref[...] = ap[:, 0:1, :].astype(jnp.float32)
        vc_ref[...] = ac[:, 0:1].astype(jnp.float32)

    @pl.when(l > 0)
    def _step():
        vp = o_ref[...]              # [G, 1, P] fp32
        vc = vc_ref[...]             # [G, 1] fp32
        acf = ac.astype(jnp.float32)
        new_vc = (vc[:, 0] * acf[:, 0]
                  + jnp.sum(vp[:, 0, :] * acf[:, 1:], axis=-1))
        if how == "f32dot":  # current shipped version
            apf = ap.astype(jnp.float32)
            new_vp = (vc[:, :, None] * apf[:, 0:1, :]
                      + jax.lax.dot_general(
                          vp, apf[:, 1:, :], (((2,), (1,)), ((0,), (0,))),
                          preferred_element_type=jnp.float32))
        elif how == "bf16dot":  # bf16 operands on the MXU, f32 accumulate
            new_vp = (vc[:, :, None] * ap[:, 0:1, :].astype(jnp.float32)
                      + jax.lax.dot_general(
                          vp.astype(jnp.bfloat16), ap[:, 1:, :],
                          (((2,), (1,)), ((0,), (0,))),
                          preferred_element_type=jnp.float32))
        elif how == "vpu":  # broadcast-multiply + sublane reduction
            new_vp = (vc[:, :, None] * ap[:, 0:1, :].astype(jnp.float32)
                      + jnp.sum(vp[:, 0, :, None]
                                * ap[:, 1:, :].astype(jnp.float32),
                                axis=1, keepdims=True))
        o_ref[...] = new_vp
        vc_ref[...] = new_vc[:, None]


def chain(pp, pc, how, g):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L, B, H, N, P = pp.shape
    Z = B * H
    while Z % g:
        g //= 2
    ppf = pp.reshape(L, Z, N, P)
    pcf = pc.reshape(L, Z, N)
    out = pl.pallas_call(
        functools.partial(variant_kernel, how=how),
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


def main():
    L, B, H, N = 12, 128, 12, 129
    P = N - 1
    rng = np.random.RandomState(0)
    pp = jnp.asarray(rng.rand(L, B, H, N, P), jnp.bfloat16)
    pc = jnp.asarray(rng.rand(L, B, H, N), jnp.bfloat16)

    from editor_tpu.ops.rollout import rollout_from_probs
    probs = jnp.concatenate([pc[..., None], pp], axis=-1)
    want = np.asarray(jax.jit(rollout_from_probs)(probs.astype(jnp.float32)))

    results = {}
    for how in ("f32dot", "bf16dot", "vpu"):
        for g in (32, 64, 128, 256):
            try:
                fn = jax.jit(functools.partial(chain, how=how, g=g))
                got = np.asarray(fn(pp, pc))
                rel = (np.abs(got - want).max()
                       / max(np.abs(want).max(), 1e-9))
                t = timeit(fn, pp, pc)
                results[(how, g)] = (t, rel)
                print(f"{how:8s} g={g:4d}: {t:7.3f} ms  relerr={rel:.2e}",
                      flush=True)
            except Exception as e:
                print(f"{how:8s} g={g:4d}: FAIL {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)
    best = min(results.items(), key=lambda kv: kv[1][0])
    print("BEST:", best)


if __name__ == "__main__":
    main()
