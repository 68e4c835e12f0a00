"""Tensor-parallel parameter shardings for the ('data', 'model') mesh.

The reference has NO tensor parallelism (SURVEY.md §2.2 checklist — its
closest artifact is the chunk-sharded ShardedTensor prototype,
distributed/_sharded_tensor/api.py:177). The TPU-native expression needs no
new runtime: Megatron-style column/row splits are just NamedShardings on
the existing mesh — qkv/fc1 weights column-split over 'model', proj/fc2
row-split — and XLA/GSPMD derives the all-reduce points. Works with the
XLA attention path (CPU tests and the multi-chip dry run); the Pallas
kernels are data-parallel-only, so TP meshes run the backbone's XLA path
(vit._attention falls back automatically off-TPU; on TPU a shard_map
wrapping is the extension point).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


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
