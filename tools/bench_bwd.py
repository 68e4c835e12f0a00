"""Microbench: frequency stage + backward-kernel group sweeps."""

from __future__ import annotations

import functools
import importlib
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


def main():
    rng = np.random.RandomState(0)

    # ---- frequency stage (reshape-sum vs prior reduce_window) ------------
    from editor_tpu.models.frequency import frequency_token_select
    images = {m: jnp.asarray(rng.randn(128, 256, 128, 3), jnp.bfloat16)
              for m in ("RGB", "NI", "TI")}
    freq = jax.jit(lambda im: frequency_token_select(
        [im[m] for m in ("RGB", "NI", "TI")], keep=10, stride=16, window=16))
    t = timeit(freq, images)
    print(f"frequency (reshape-sum): {t:7.3f} ms", flush=True)

    # ---- attention bwd kernel group sweep (backbone shapes) --------------
    FA = importlib.import_module("editor_tpu.ops.fused_attention")
    B, N, C, H = 384, 129, 768, 12
    scale = (C // H) ** -0.5
    qkv = jnp.asarray(rng.randn(B, N, 3 * C), jnp.bfloat16)
    g_out = jnp.asarray(rng.randn(B, N, C), jnp.bfloat16)
    for g in (2, 4):
        try:
            fn = jax.jit(functools.partial(FA._pallas_attention_qkv_bwd,
                                           num_heads=H, scale=scale, group=g))
            t = timeit(fn, qkv, g_out)
            print(f"attn bwd g={g}: {t:7.3f} ms", flush=True)
        except Exception as e:
            print(f"attn bwd g={g}: FAIL {type(e).__name__} {str(e)[:90]}",
                  flush=True)

    # ---- masked bwd kernels ---------------------------------------------
    MA = importlib.import_module("editor_tpu.ops.masked_attention")
    mask = jnp.asarray(rng.rand(128, 129) > 0.5, jnp.float32).at[:, 0].set(1.)
    qkv3 = jnp.asarray(rng.randn(384, 129, 3 * C), jnp.bfloat16)
    go3 = jnp.asarray(rng.randn(384, 129, C), jnp.bfloat16)
    m3 = jnp.tile(mask, (3, 1))
    for g in (2, 4):
        try:
            fn = jax.jit(functools.partial(
                MA._pallas_masked_qkv_bwd, num_heads=H, scale=scale,
                mask_fill=-65504.0, tile=129, group=g))
            t = timeit(fn, qkv3, m3, go3)
            print(f"masked bwd N=129 g={g}: {t:7.3f} ms", flush=True)
        except Exception as e:
            print(f"masked bwd N=129 g={g}: FAIL {type(e).__name__} "
                  f"{str(e)[:90]}", flush=True)
    qkvJ = jnp.asarray(rng.randn(128, 387, 3 * C), jnp.bfloat16)
    goJ = jnp.asarray(rng.randn(128, 387, C), jnp.bfloat16)
    mJ = jnp.tile(mask, (1, 3))
    for g in (1, 2):
        try:
            fn = jax.jit(functools.partial(
                MA._pallas_masked_qkv_bwd, num_heads=H, scale=scale,
                mask_fill=-65504.0, tile=129, group=g))
            t = timeit(fn, qkvJ, mJ, goJ)
            print(f"masked bwd N=387 g={g}: {t:7.3f} ms", flush=True)
        except Exception as e:
            print(f"masked bwd N=387 g={g}: FAIL {type(e).__name__} "
                  f"{str(e)[:90]}", flush=True)


if __name__ == "__main__":
    main()
