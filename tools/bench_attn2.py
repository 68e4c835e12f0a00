"""Microbench: softmax-pass trims in the attention kernel + tail tuning."""

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


def _kernel_nomax(qkv_ref, o_ref, *, scale, H, D):
    """Forward kernel without the running-max stabilization (exp of raw
    logits — safe while |logits*scale| < ~80)."""
    blk = qkv_ref[...]
    C = H * D
    outs = []
    for h in range(H):
        q = blk[:, :, h * D:(h + 1) * D]
        k = blk[:, :, C + h * D:C + (h + 1) * D]
        v = blk[:, :, 2 * C + h * D:2 * C + (h + 1) * D]
        kp = k[:, 1:, :]
        lp = jax.lax.dot_general(q, kp, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32) * scale
        lc = jnp.sum(q.astype(jnp.float32) * k[:, 0:1, :].astype(jnp.float32),
                     axis=-1) * scale
        ep = jnp.exp(lp)
        ec = jnp.exp(lc)
        inv = 1.0 / (jnp.sum(ep, axis=-1) + ec)
        pp = ep * inv[:, :, None]
        pc = ec * inv
        out = jax.lax.dot_general(pp.astype(v.dtype), v[:, 1:, :],
                                  (((2,), (1,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32)
        out = out + pc[:, :, None] * v[:, 0:1, :].astype(jnp.float32)
        outs.append(out.astype(o_ref.dtype))
    o_ref[...] = jnp.concatenate(outs, axis=-1)


def nomax_attn(qkv, H, scale, g):
    import jax.experimental.pallas as pl
    B, N, C3 = qkv.shape
    C = C3 // 3
    return pl.pallas_call(
        functools.partial(_kernel_nomax, scale=scale, H=H, D=C // H),
        out_shape=jax.ShapeDtypeStruct((B, N, C), qkv.dtype),
        grid=(B // g,),
        in_specs=[pl.BlockSpec((g, N, C3), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((g, N, C), lambda i: (i, 0, 0)),
    )(qkv)


def main():
    B, N, C, H = 384, 129, 768, 12
    scale = (C // H) ** -0.5
    rng = np.random.RandomState(0)
    qkv = jnp.asarray(rng.randn(B, N, 3 * C), jnp.bfloat16)

    from editor_tpu.ops import fused_attention as FA
    want = np.asarray(jax.jit(functools.partial(
        FA._pallas_attention_qkv, num_heads=H, scale=scale,
        with_probs=False))(qkv), np.float32)
    base = timeit(jax.jit(functools.partial(
        FA._pallas_attention_qkv, num_heads=H, scale=scale,
        with_probs=False)), qkv)
    print(f"baseline kernel g=4: {base:7.3f} ms", flush=True)

    for g in (2, 4):
        try:
            fn = jax.jit(functools.partial(nomax_attn, H=H, scale=scale, g=g))
            got = np.asarray(fn(qkv), np.float32)
            rel = np.abs(got - want).max() / np.abs(want).max()
            t = timeit(fn, qkv)
            print(f"nomax g={g}: {t:7.3f} ms relerr={rel:.2e}", flush=True)
        except Exception as e:
            print(f"nomax g={g}: FAIL {type(e).__name__} {str(e)[:90]}",
                  flush=True)

    # ---- tail: joint masked attention (N=387) group sweep ----------------
    import importlib
    MA = importlib.import_module('editor_tpu.ops.masked_attention')
    B2, N2 = 128, 387
    qkv2 = jnp.asarray(rng.randn(B2, N2, 3 * C), jnp.bfloat16)
    mask = jnp.asarray(rng.rand(B2, 129) > 0.5, jnp.float32)
    mask = mask.at[:, 0].set(1.0)
    maskN = jnp.tile(mask, (1, 3))
    for g in (1, 2):
        try:
            fn = jax.jit(functools.partial(
                MA._pallas_masked_from_qkv, num_heads=H, scale=scale,
                mask_fill=-65504.0, tile=129, group=g))
            t = timeit(fn, qkv2, maskN)
            print(f"joint masked N=387 g={g}: {t:7.3f} ms", flush=True)
        except Exception as e:
            print(f"joint masked N=387 g={g}: FAIL {type(e).__name__} "
                  f"{str(e)[:90]}", flush=True)

    # per-modality masked attention (N=129, 3B batch)
    qkv3 = jnp.asarray(rng.randn(3 * B2, 129, 3 * C), jnp.bfloat16)
    mask3 = jnp.tile(mask, (3, 1))
    for g in (4, 8):
        try:
            fn = jax.jit(functools.partial(
                MA._pallas_masked_from_qkv, num_heads=H, scale=scale,
                mask_fill=-65504.0, tile=129, group=g))
            t = timeit(fn, qkv3, mask3)
            print(f"modal masked N=129 g={g}: {t:7.3f} ms", flush=True)
        except Exception as e:
            print(f"modal masked N=129 g={g}: FAIL {type(e).__name__} "
                  f"{str(e)[:90]}", flush=True)


if __name__ == "__main__":
    main()
