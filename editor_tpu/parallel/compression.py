"""Gradient-compression communication hooks.

reference: distributed/algorithms/ddp_comm_hooks/ — allreduce (:23),
fp16/bf16 compress (:41,:73), per-tensor quantization
(quantization_hooks.py:45), and PowerSGD low-rank compression with error
feedback + warm start (powerSGD_hook.py:262, PowerSGDState :88,
_orthogonalize :11).

TPU-native expression: a *reducer* — (init, reduce) pair used inside the
shard_map data-parallel train step (editor_tpu/parallel/ddp.py) where the
gradient all-reduce is explicit. ``reduce`` maps per-device gradients to the
averaged gradients, communicating less than the full fp32 payload; its state
(PowerSGD's P/Q warm start + error feedback) is carried in the train state.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


@dataclasses.dataclass
class Reducer:
    init: Callable[[Any], Any]  # grads_template -> comm_state
    reduce: Callable[[Any, Any, str], Tuple[Any, Any]]  # (grads, state, axis) -> (avg_grads, state)
    name: str


def _no_state(_):
    return ()


def allreduce_reducer() -> Reducer:
    """Vanilla DDP mean all-reduce (default_hooks.py:23)."""
    def reduce(grads, state, axis_name):
        return jax.tree_util.tree_map(
            lambda g: lax.pmean(g, axis_name), grads), state
    return Reducer(_no_state, reduce, "allreduce")


def cast_compress_reducer(dtype) -> Reducer:
    """fp16/bf16 compression: cast → all-reduce → cast back
    (default_hooks.py:41,73). Halves ICI payload."""
    def reduce(grads, state, axis_name):
        def one(g):
            return lax.pmean(g.astype(dtype), axis_name).astype(g.dtype)
        return jax.tree_util.tree_map(one, grads), state
    return Reducer(_no_state, reduce, f"cast_{jnp.dtype(dtype).name}")


def int8_quantize_reducer() -> Reducer:
    """Per-tensor symmetric int8 quantization: quantize → all-gather →
    dequantize → mean (quantization_hooks.py:45-116 semantics)."""
    def reduce(grads, state, axis_name):
        def one(g):
            scale = jnp.max(jnp.abs(g)) / 127.0 + 1e-12
            q = jnp.clip(jnp.round(g / scale), -127, 127).astype(jnp.int8)
            qs = lax.all_gather(q, axis_name)          # [W, ...] int8
            scales = lax.all_gather(scale, axis_name)  # [W]
            deq = qs.astype(g.dtype) * scales.reshape(
                (-1,) + (1,) * g.ndim).astype(g.dtype)
            return jnp.mean(deq, axis=0)
        return jax.tree_util.tree_map(one, grads), state
    return Reducer(_no_state, reduce, "int8")


# ---------------------------------------------------------------------------
# PowerSGD
# ---------------------------------------------------------------------------

def _orthogonalize(m: Array, eps: float = 1e-8) -> Array:
    """Gram-Schmidt over columns (powerSGD_hook.py:11-40)."""
    def body(i, m):
        col = lax.dynamic_slice_in_dim(m, i, 1, axis=1)
        col = col / (jnp.linalg.norm(col) + eps)
        # subtract projection of later columns onto col
        proj = (m * col).sum(axis=0, keepdims=True)  # [1, r]
        idx = jnp.arange(m.shape[1])[None, :]
        keep = (idx <= i).astype(m.dtype)
        m = m - col @ (proj * (1 - keep))
        m = lax.dynamic_update_slice_in_dim(m, col, i, axis=1)
        return m
    return lax.fori_loop(0, m.shape[1], body, m)


def _compressible(shape, rank: int, min_compression_rate: float) -> bool:
    if len(shape) < 2:
        return False
    import numpy as np
    n = int(np.prod(shape[:-1]))
    m = int(shape[-1])
    uncompressed = n * m
    compressed = (n + m) * rank
    return uncompressed / max(compressed, 1) >= min_compression_rate


def powersgd_reducer(rank: int = 4, seed: int = 0,
                     min_compression_rate: float = 2.0) -> Reducer:
    """Low-rank gradient compression with error feedback + warm start
    (powerSGD_hook.py:262-536). Matrix-shaped leaves compressed to rank-r
    P·Qᵀ; small/1D leaves take the vanilla all-reduce path."""

    def init(grads_template):
        state: Dict[str, Any] = {}
        key = jax.random.PRNGKey(seed)
        for kp, leaf in jax.tree_util.tree_leaves_with_path(grads_template):
            name = jax.tree_util.keystr(kp)
            shape = leaf.shape
            if _compressible(shape, rank, min_compression_rate):
                import numpy as np
                n = int(np.prod(shape[:-1]))
                m = int(shape[-1])
                key, sub = jax.random.split(key)
                state[name] = {
                    "q": jax.random.normal(sub, (m, rank), jnp.float32),
                    "error": jnp.zeros(shape, jnp.float32),
                }
        return state

    def reduce(grads, state, axis_name):
        new_state = dict(state)
        flat = jax.tree_util.tree_leaves_with_path(grads)
        out_leaves = []
        for kp, g in flat:
            name = jax.tree_util.keystr(kp)
            if name not in state:
                out_leaves.append(lax.pmean(g, axis_name))
                continue
            st = state[name]
            shape = g.shape
            mtx = g.astype(jnp.float32).reshape(-1, shape[-1]) \
                + st["error"].reshape(-1, shape[-1])
            q = st["q"]
            p = lax.pmean(mtx @ q, axis_name)          # [n, r] collective
            p = _orthogonalize(p)
            q_new = lax.pmean(mtx.T @ p, axis_name)    # [m, r] collective
            approx = p @ q_new.T
            err = mtx - approx
            new_state[name] = {"q": q_new, "error": err.reshape(shape)}
            out_leaves.append(approx.reshape(shape).astype(g.dtype))
        treedef = jax.tree_util.tree_structure(grads)
        return jax.tree_util.tree_unflatten(treedef, out_leaves), new_state

    return Reducer(init, reduce, f"powersgd{rank}")


def make_reducer(name: str, **kw) -> Reducer:
    """Registry (the enum registry equivalent, ddp_comm_hooks/__init__.py:38)."""
    if name in ("none", "allreduce"):
        return allreduce_reducer()
    if name == "fp16":
        return cast_compress_reducer(jnp.float16)
    if name == "bf16":
        return cast_compress_reducer(jnp.bfloat16)
    if name == "int8":
        return int8_quantize_reducer()
    if name == "powersgd":
        return powersgd_reducer(rank=kw.get("rank", 4))
    raise ValueError(f"unknown reducer '{name}'")
