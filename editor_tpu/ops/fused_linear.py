"""Fused LayerNorm -> matmul (-> GELU) kernel.

In the XLA graph, LayerNorm's output is materialized to HBM before the
following dot reads it back: ~76 MB per direction per layer at the flagship
batch. This kernel keeps the normalized activations in VMEM — LN on the
VPU, the matmul on the MXU with the weight resident across grid steps —
and optionally applies erf-GELU to the product before the single output
write. Used for the backbone's norm1->qkv and norm2->fc1(+gelu) pairs
(editor_tpu/models/vit.py).

Backward: XLA recompute under ``jax.custom_vjp`` (LN + matmul VJPs — the
backward pays the materialization once; the forward savings are what
matter for eval and for remat'd training, whose recompute also uses this
kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


def _xla_ln_matmul(x, w, b, gamma, beta, eps, act):
    cd = jnp.promote_types(x.dtype, jnp.float32)
    xf = x.astype(cd)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = (y * gamma.astype(cd) + beta.astype(cd)).astype(x.dtype)
    out = (y @ w.astype(x.dtype)).astype(cd) + b.astype(cd)
    if act == "gelu":
        out = jax.nn.gelu(out, approximate=False)
    return out.astype(x.dtype)


def _erf_approx(z):
    """Abramowitz & Stegun 7.1.26 rational erf (max abs err 1.5e-7 — far
    below bf16 resolution; Mosaic has no erf/erfc lowering)."""
    s = jnp.sign(z)
    z = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * z)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-z * z))


def _kernel(x_ref, w_ref, b_ref, g_ref, bb_ref, o_ref, *, eps, act):
    x = x_ref[...]                       # [R, C] bf16
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * g_ref[...].astype(jnp.float32) + bb_ref[...].astype(jnp.float32)
    out = jax.lax.dot(y.astype(x.dtype), w_ref[...],
                      preferred_element_type=jnp.float32)
    out = out + b_ref[...].astype(jnp.float32)
    if act == "gelu":
        out = 0.5 * out * (1.0 + _erf_approx(out * 0.7071067811865476))
    o_ref[...] = out.astype(o_ref.dtype)


def _pick_rows(total: int, target: int = 256) -> int:
    best = 8
    for r in range(target, 7, -8):
        if total % r == 0:
            best = r
            break
    return best


def _pallas_ln_matmul(x2, w, b, gamma, beta, eps, act):
    import jax.experimental.pallas as pl

    T, C = x2.shape
    O = w.shape[1]
    R = _pick_rows(T)
    if T % R:
        # no divisor of T in [8, 256]: pad the row axis up to a multiple of
        # a full-size block so every output row is written, then slice the
        # pad back off (zero rows LN to 0*rsqrt(eps) — finite, discarded).
        R = 256
        pad = R - T % R
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
        out = _pallas_ln_matmul(x2, w, b, gamma, beta, eps, act)
        return out[:T]
    return pl.pallas_call(
        functools.partial(_kernel, eps=eps, act=act),
        out_shape=jax.ShapeDtypeStruct((T, O), x2.dtype),
        grid=(T // R,),
        in_specs=[
            pl.BlockSpec((R, C), lambda i: (i, 0)),
            pl.BlockSpec((C, O), lambda i: (0, 0)),   # weight resident
            pl.BlockSpec((O,), lambda i: (0,)),
            pl.BlockSpec((C,), lambda i: (0,)),
            pl.BlockSpec((C,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((R, O), lambda i: (i, 0)),
    )(x2, w.astype(x2.dtype), b, gamma, beta)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def ln_matmul(x: Array, w: Array, b: Array, gamma: Array, beta: Array,
              eps: float = 1e-6, act: str = "") -> Array:
    """LayerNorm(x; gamma, beta) @ w + b, optionally GELU'd.

    x: [..., C]; w: [C, O]; returns [..., O]. On TPU the whole chain runs
    in one Pallas kernel; elsewhere (and in the backward) the XLA graph.
    """
    shape = x.shape
    if jax.default_backend() == "tpu":
        x2 = x.reshape(-1, shape[-1])
        out = _pallas_ln_matmul(x2, w, b, gamma, beta, eps, act)
        return out.reshape(*shape[:-1], w.shape[1])
    return _xla_ln_matmul(x, w, b, gamma, beta, eps, act)


def _fwd(x, w, b, gamma, beta, eps, act):
    return ln_matmul(x, w, b, gamma, beta, eps, act), (x, w, b, gamma, beta)


def _bwd(eps, act, res, grad):
    x, w, b, gamma, beta = res
    _, vjp = jax.vjp(
        lambda x_, w_, b_, g_, bb_: _xla_ln_matmul(x_, w_, b_, g_, bb_, eps,
                                                   act),
        x, w, b, gamma, beta)
    return vjp(grad)


ln_matmul.defvjp(_fwd, _bwd)
