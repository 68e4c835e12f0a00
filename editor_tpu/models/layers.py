"""Pure-functional NN building blocks (param pytrees + apply functions).

TPU-first design notes:
  * Parameters are plain nested dicts of ``jnp.ndarray`` — they compose directly
    with ``jax.tree_util``, ``NamedSharding``/pjit, and optax without framework
    baggage, and keep the torch-checkpoint converter trivial.
  * Linear weights are stored **[in, out]** (x @ W), the transpose of torch's
    ``nn.Linear.weight`` ([out, in]); conv kernels are HWIO (torch: OIHW). The
    converter in editor_tpu/utils/torch_convert.py performs the transposes.
  * All numerics mirror the reference where it matters for checkpoint parity:
    erf-GELU (torch nn.GELU default), LayerNorm eps=1e-6 for the ViT
    (reference: modeling/backbones/vit_pytorch.py:699), BatchNorm1d eps=1e-5 /
    momentum=0.1 with unbiased running-var updates (torch defaults).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------

def trunc_normal(key: Array, shape, std: float = 0.02, mean: float = 0.0,
                 a: float = -2.0, b: float = 2.0, dtype=jnp.float32) -> Array:
    """Truncated normal matching torch's trunc_normal_ (inverse-CDF method).

    reference: modeling/backbones/vit_pytorch.py:730-762.
    """
    def norm_cdf(x):
        return (1.0 + math.erf(x / math.sqrt(2.0))) / 2.0

    lo = norm_cdf((a - mean) / std)
    hi = norm_cdf((b - mean) / std)
    u = jax.random.uniform(key, shape, dtype=jnp.float32,
                           minval=2 * lo - 1, maxval=2 * hi - 1)
    x = jax.scipy.special.erfinv(u)
    x = x * (std * math.sqrt(2.0)) + mean
    return jnp.clip(x, a, b).astype(dtype)


def kaiming_normal(key: Array, shape, fan: int, dtype=jnp.float32) -> Array:
    """He-normal with gain sqrt(2) over the given fan (reference:
    modeling/make_model.py:10-23 uses a=0, fan_out for Linear, fan_in for Conv)."""
    std = math.sqrt(2.0 / fan)
    return (jax.random.normal(key, shape, dtype=jnp.float32) * std).astype(dtype)


# ---------------------------------------------------------------------------
# linear
# ---------------------------------------------------------------------------

def linear_init(key: Array, d_in: int, d_out: int, bias: bool = True,
                init: str = "trunc_normal", std: float = 0.02) -> dict:
    if init == "trunc_normal":
        w = trunc_normal(key, (d_in, d_out), std=std)
    elif init == "kaiming_out":  # kaiming_normal_(fan_out) on torch [out,in] == fan over d_in? see note
        # torch fan_out for a [out,in] weight is `out`; gain sqrt(2)
        w = kaiming_normal(key, (d_in, d_out), fan=d_out)
    elif init == "classifier":  # normal std=0.001 (reference: make_model.py:26-31)
        w = jax.random.normal(key, (d_in, d_out)) * 0.001
    elif init == "zeros":
        w = jnp.zeros((d_in, d_out))
    else:
        raise ValueError(init)
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((d_out,))
    return p


def linear(p: dict, x: Array) -> Array:
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# layer norm (fp32 accumulation)
# ---------------------------------------------------------------------------

def layernorm_init(dim: int) -> dict:
    return {"w": jnp.ones((dim,)), "b": jnp.zeros((dim,))}


def layernorm(p: dict, x: Array, eps: float = 1e-6) -> Array:
    # compute dtype: at least f32 (bf16 inputs upcast; f64 stays f64)
    cd = jnp.promote_types(x.dtype, jnp.float32)
    xf = x.astype(cd)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * p["w"].astype(cd) + p["b"].astype(cd)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# batch norm 1d (stateful: returns new running stats)
# ---------------------------------------------------------------------------

def batchnorm1d_init(dim: int) -> Tuple[dict, dict]:
    """Returns (params, state). Torch defaults: eps=1e-5, momentum=0.1."""
    params = {"w": jnp.ones((dim,)), "b": jnp.zeros((dim,))}
    state = {"mean": jnp.zeros((dim,)), "var": jnp.ones((dim,))}
    return params, state


def batchnorm1d(p: dict, state: dict, x: Array, training: bool,
                eps: float = 1e-5, momentum: float = 0.1) -> Tuple[Array, dict]:
    """BatchNorm1d over [B, C]; matches torch semantics: normalize with biased
    batch var during training, update running var with the unbiased estimate.

    The reference applies a *shared* BN head to three modalities sequentially
    (reference: modeling/make_model.py:169-171), so callers must thread `state`
    through each call in the same order to reproduce the mixed running stats.
    """
    cd = jnp.promote_types(x.dtype, jnp.float32)
    xf = x.astype(cd)
    if training:
        mu = jnp.mean(xf, axis=0)
        var = jnp.mean(jnp.square(xf - mu), axis=0)
        n = x.shape[0]
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mu,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mu, var = state["mean"], state["var"]
        new_state = state
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * p["w"].astype(cd) + p["b"].astype(cd)
    return y.astype(x.dtype), new_state


# ---------------------------------------------------------------------------
# activations / stochastic regularizers
# ---------------------------------------------------------------------------

def gelu(x: Array) -> Array:
    """Exact erf-GELU — torch nn.GELU default; required for checkpoint parity."""
    return jax.nn.gelu(x, approximate=False)


def drop_path(key: Optional[Array], x: Array, rate: float, training: bool) -> Array:
    """Per-sample stochastic depth (reference: vit_pytorch.py:52-69)."""
    if not training or rate == 0.0 or key is None:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jnp.floor(keep + jax.random.uniform(key, shape, dtype=x.dtype))
    return x / keep * mask


def dropout(key: Optional[Array], x: Array, rate: float, training: bool) -> Array:
    if not training or rate == 0.0 or key is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)
