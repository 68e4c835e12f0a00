"""Tensor-parallel parameter shardings for the ('data', 'model') mesh.

The reference has NO tensor parallelism (SURVEY.md §2.2 checklist — its
closest artifact is the chunk-sharded ShardedTensor prototype,
distributed/_sharded_tensor/api.py:177). The TPU-native expression needs no
new runtime: Megatron-style column/row splits are just NamedShardings on
the existing mesh — qkv/fc1 weights column-split over 'model', proj/fc2
row-split — and XLA/GSPMD derives the all-reduce points.

Fused-kernel TP: the flat qkv output dim is laid out [q_h0..q_hH | k_… |
v_…], so a contiguous GSPMD split would hand shard 0 "all of q plus half
of k" — useless to a kernel. :func:`permute_qkv_params` reorders the qkv
columns SHARD-major ([q,k,v for heads 0..H/t-1 | q,k,v for the next block |
…]) so each contiguous model-shard is a self-contained qkv block for its
own heads; the backbone then runs the UNCHANGED Pallas attention kernel per
shard under ``shard_map`` with H/t local heads (models/vit.py). The
attention output keeps global head-major order, so the row-split proj needs
no permutation, and non-attention layers stay pure GSPMD.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def qkv_tp_permutation(num_heads: int, head_dim: int, tp: int) -> np.ndarray:
    """Column permutation π with new_w[:, j] = w[:, π[j]]: flat
    [q_h*|k_h*|v_h*] → tp contiguous blocks, each [q|k|v] over H/tp heads."""
    H, D = num_heads, head_dim
    C = H * D
    if H % tp:
        raise ValueError(f"num_heads {H} not divisible by tp {tp}")
    hl = H // tp
    idx = []
    for s in range(tp):
        for part in range(3):  # q, k, v regions of the flat layout
            for h in range(s * hl, (s + 1) * hl):
                idx.extend(range(part * C + h * D, part * C + (h + 1) * D))
    return np.asarray(idx, dtype=np.int64)


def permute_qkv_params(params: Any, num_heads: int, tp: int,
                       inverse: bool = False) -> Any:
    """Reorder every backbone block's fused qkv weight columns (and bias)
    into the shard-major TP layout (or back, ``inverse=True`` — used when
    exporting a TP-trained state to the canonical layout)."""
    if tp <= 1:
        return params
    # copy-on-write along the single path being rewritten; every other
    # subtree is shared with the input (never mutated)
    out = dict(params)
    bb = dict(out["BACKBONE"])
    blocks = dict(bb["blocks"])
    attn = dict(blocks["attn"])
    qkv = dict(attn["qkv"])
    D = qkv["w"].shape[-1] // (3 * num_heads)
    perm = qkv_tp_permutation(num_heads, D, tp)
    if inverse:
        perm = np.argsort(perm)
    qkv["w"] = qkv["w"][..., perm]
    if "b" in qkv:
        qkv["b"] = qkv["b"][..., perm]
    attn["qkv"] = qkv
    blocks["attn"] = attn
    bb["blocks"] = blocks
    out["BACKBONE"] = bb
    return out


def permute_train_state(state: Any, num_heads: int, tp: int,
                        inverse: bool = False) -> Any:
    """Apply the qkv TP column permutation to a TrainState's params AND the
    params-shaped optimizer buffers (SGD momentum / AdamW mu+nu) so
    checkpoints can be written in the CANONICAL layout (``inverse=True``
    before save) and re-entered into a TP run (forward after restore) —
    TP-trained checkpoints then load into non-TP / different-tp runs."""
    import dataclasses as _dc

    from editor_tpu.solver.optimizer import AdamWState, SGDState

    if tp <= 1:
        return state
    perm = lambda t: permute_qkv_params(t, num_heads, tp, inverse)
    opt = state.opt_state
    if isinstance(opt, SGDState):
        opt = SGDState(momentum=perm(opt.momentum))
    elif isinstance(opt, AdamWState):
        opt = AdamWState(mu=perm(opt.mu), nu=perm(opt.nu), count=opt.count)
    return _dc.replace(state, params=perm(state.params), opt_state=opt)


def editor_tp_shardings(params: Any, mesh: Mesh, axis: str = "model") -> Any:
    """NamedSharding pytree for EDITOR params: backbone attention/MLP
    weights Megatron-split over ``axis``, everything else replicated.

    Column-parallel (output dim sharded): qkv, fc1 — their biases shard the
    same dim. Row-parallel (input dim sharded): proj, fc2 — XLA inserts the
    partial-sum all-reduce after them. Leading dim of every block tensor is
    the stacked layer axis (vit.py vit_init), left unsharded.
    """
    repl = NamedSharding(mesh, P())

    def spec_for(path, leaf) -> NamedSharding:
        keys = [getattr(k, "key", getattr(k, "name", "")) for k in path]
        if "blocks" not in keys:
            return repl
        joined = "/".join(keys)
        col = ("attn/qkv" in joined) or ("mlp/fc1" in joined)
        row = ("attn/proj" in joined) or ("mlp/fc2" in joined)
        if col and keys[-1] == "w":        # [L, in, out] — split out
            return NamedSharding(mesh, P(None, None, axis))
        if col and keys[-1] == "b":        # [L, out]
            return NamedSharding(mesh, P(None, axis))
        if row and keys[-1] == "w":        # [L, in, out] — split in
            return NamedSharding(mesh, P(None, axis, None))
        return repl

    return jax.tree_util.tree_map_with_path(spec_for, params)


def train_state_tp_shardings(state: Any, mesh: Mesh,
                             axis: str = "model") -> Any:
    """TrainState shardings: TP params + matching optimizer-momentum
    layout, replicated model state/rng/step."""
    from editor_tpu.engine.train import TrainState

    repl = NamedSharding(mesh, P())
    p_sh = editor_tp_shardings(state.params, mesh, axis)
    # optimizer buffers (SGD momentum / AdamW mu+nu, solver/optimizer.py)
    # mirror the param tree shape-for-shape: give each buffer its param's
    # sharding, scalars (step counts) replicated
    p_sh_leaves = {id_path: sh for id_path, sh in
                   jax.tree_util.tree_leaves_with_path(p_sh)}

    def buffer_spec(path, leaf):
        if not hasattr(leaf, "shape") or leaf.ndim == 0:
            return repl
        # match by the trailing param path (the buffer tree nests the param
        # tree under fields like 'momentum'/'mu'/'nu')
        for pth, sh in p_sh_leaves.items():
            if len(pth) <= len(path) and path[-len(pth):] == pth:
                return sh
        return repl

    return TrainState(
        params=p_sh,
        opt_state=jax.tree_util.tree_map_with_path(buffer_spec,
                                                   state.opt_state),
        model_state=jax.tree_util.tree_map(lambda _: repl, state.model_state),
        rng=repl,
        step=repl,
    )
