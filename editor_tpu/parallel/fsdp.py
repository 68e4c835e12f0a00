"""FSDP / ZeRO-3: parameter + gradient + optimizer-state sharding over 'data'.

The reference stops at ZeRO-1 (optimizer-state sharding,
distributed/optim/zero_redundancy_optimizer.py:267); full parameter sharding
(torch FSDP / ZeRO-3) has no counterpart there. On TPU it is a pure layout
statement: every large parameter leaf (and its optimizer-state twin) is
sharded over the 'data' mesh axis via NamedSharding, and XLA derives the
exact FSDP communication schedule from the annotations:

  * all-gather each layer's params over ICI just before they are consumed
    by the forward / recomputed backward (overlapped with compute by the
    scheduler — the hand-written prefetch of torch FSDP),
  * reduce-scatter the gradients so each device only materializes its own
    1/data_size shard for the optimizer update,
  * keep params resident in HBM only as shards between steps.

Math is unchanged — parity vs the replicated step is tested in
tests/test_parallel.py. Per-device parameter memory drops by ~data_size
(see ``param_memory_bytes``), which is what unlocks models larger than one
chip's HBM without pipeline stages.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from editor_tpu.parallel.zero import _MIN_SHARD_ELEMS


def _fsdp_leaf_spec(leaf: Any, size: int) -> P:
    """FSDP storage spec for one leaf: shard the largest ``size``-divisible
    EXPANSION dim (strictly larger than every other non-leading dim — the
    3C/4C hidden widths, class counts).

    Unlike the ZeRO-1 spec (optimizer state never enters the model graph),
    param storage shardings are visible to GSPMD propagation inside the
    forward/backward: sharding a dim of the residual width C (a square
    attention-proj matrix, a conv kernel's output channels) propagates a
    channel sharding into the activation / cotangent streams, where it
    collides with the batch sharding inside the depth-scan carries and
    forces an involuntary full rematerialization ([SPMD] warning). Hence:
    rank-4 spatial kernels and square matrices stay replicated; only dims
    that die inside one layer are sharded.
    """
    shape = getattr(leaf, "shape", ())
    if not shape or leaf.size < max(2 * size, _MIN_SHARD_ELEMS):
        return P()
    if len(shape) >= 4:  # spatial conv kernels feed the residual stream
        return P()
    if len(shape) == 3 and (shape[0] == 1 or shape[1] == 1):
        # broadcast / embedding-table leaves ([1, N, C] pos-embeds,
        # [K, 1, C] SIE tables) add straight into the activation stream —
        # sharding their feature dim propagates a channel sharding into it
        return P()
    for ax in sorted(range(len(shape)), key=lambda i: -shape[i]):
        if shape[ax] % size or shape[ax] < size:
            continue
        # the leading dim of a STACKED (rank-3 scan) leaf is depth, not a
        # competing width — exclude it from the comparison only there;
        # for rank-2 all other dims compete (a square [C, C] proj must
        # lose: its output IS the residual width)
        others = [shape[i] for i in range(len(shape))
                  if i != ax and not (i == 0 and len(shape) >= 3)]
        if all(shape[ax] > o for o in others):
            spec = [None] * len(shape)
            spec[ax] = "data"
            return P(*spec)
    return P()


def fsdp_shardings(tree: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Per-leaf NamedShardings sharding each large leaf over ``axis``.

    Works for params, gradients (same pytree), and optimizer state alike;
    leaves too small to split (or with no ``axis``-divisible expansion
    dimension — see ``_fsdp_leaf_spec``) stay replicated — they carry no
    memory win and sharding them would only add collective latency.
    """
    size = mesh.shape[axis]
    def spec_of(leaf):
        p = _fsdp_leaf_spec(leaf, size)
        if axis != "data" and any(p):
            p = type(p)(*[axis if s == "data" else s for s in p])
        return NamedSharding(mesh, p)
    return jax.tree_util.tree_map(spec_of, tree)


def shard_params(params: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Device-put a parameter pytree with FSDP sharding."""
    sh = fsdp_shardings(params, mesh, axis)
    return jax.tree_util.tree_map(jax.device_put, params, sh)


def param_memory_bytes(params: Any, per_device: bool, mesh: Mesh,
                       axis: str = "data") -> int:
    """Diagnostic: parameter bytes total vs resident per device under FSDP."""
    size = mesh.shape[axis]
    total = 0
    per = 0
    for leaf in jax.tree_util.tree_leaves(params):
        if not hasattr(leaf, "shape"):
            continue
        n = int(np.prod(leaf.shape)) * leaf.dtype.itemsize
        total += n
        spec = _fsdp_leaf_spec(leaf, size)
        per += n // size if any(spec) else n
    return per if per_device else total
