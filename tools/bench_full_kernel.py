"""Group-size sweep for the tile-free COMPACT_TAIL masked-attention kernels.

Real shapes at the flagship eval batch (B=128): per-modality stage runs
M*B=384 sequences of N=88, the joint stage 128 sequences of N=264.

Usage: python tools/bench_full_kernel.py
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


def timeit(fn, *args, iters=50):
    out = fn(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    import jax.experimental.pallas as pl

    from editor_tpu.ops.masked_attention import (_qkv_masked_full_bwd_kernel,
                                                 _qkv_masked_full_kernel)

    H, C = 12, 768
    D = C // H
    scale = D ** -0.5
    rng = np.random.RandomState(0)

    for (B, N), gs in (((384, 88), (4, 8, 16, 32)),
                       ((128, 264), (1, 2, 4))):
        qkv = jnp.asarray(rng.randn(B, N, 3 * C), jnp.bfloat16)
        m = jnp.asarray(rng.rand(B, 1, N) < 0.8, jnp.bfloat16)
        g_out = jnp.asarray(rng.randn(B, N, C), jnp.bfloat16)
        for g in gs:
            if B % g:
                continue
            kern = functools.partial(_qkv_masked_full_kernel, scale=scale,
                                     H=H, D=D, fill=-65504.0)
            fwd = jax.jit(lambda q, mm, _k=kern, _g=g: pl.pallas_call(
                _k,
                out_shape=jax.ShapeDtypeStruct((B, N, C), q.dtype),
                grid=(B // _g,),
                in_specs=[pl.BlockSpec((_g, N, 3 * C), lambda i: (i, 0, 0)),
                          pl.BlockSpec((_g, 1, N), lambda i: (i, 0, 0))],
                out_specs=pl.BlockSpec((_g, N, C), lambda i: (i, 0, 0)),
            )(q, mm))
            try:
                t = timeit(fwd, qkv, m)
                print(f"fwd  B={B} N={N} g={g}: {t:7.3f} ms")
            except Exception as e:
                print(f"fwd  B={B} N={N} g={g}: FAIL {type(e).__name__}")
        for g in gs:
            if B % g:
                continue
            kern = functools.partial(_qkv_masked_full_bwd_kernel, scale=scale,
                                     H=H, D=D, fill=-65504.0)
            bwd = jax.jit(lambda q, mm, go, _k=kern, _g=g: pl.pallas_call(
                _k,
                out_shape=jax.ShapeDtypeStruct((B, N, 3 * C), q.dtype),
                grid=(B // _g,),
                in_specs=[pl.BlockSpec((_g, N, 3 * C), lambda i: (i, 0, 0)),
                          pl.BlockSpec((_g, 1, N), lambda i: (i, 0, 0)),
                          pl.BlockSpec((_g, N, C), lambda i: (i, 0, 0))],
                out_specs=pl.BlockSpec((_g, N, 3 * C), lambda i: (i, 0, 0)),
            )(q, mm, go))
            try:
                t = timeit(bwd, qkv, m, g_out)
                print(f"bwd  B={B} N={N} g={g}: {t:7.3f} ms")
            except Exception as e:
                print(f"bwd  B={B} N={N} g={g}: FAIL {type(e).__name__}")


if __name__ == "__main__":
    main()
