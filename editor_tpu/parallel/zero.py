"""ZeRO-1: optimizer-state sharding over the data axis.

reference: distributed/optim/zero_redundancy_optimizer.py:267 — each rank
keeps 1/world_size of the optimizer state, steps its shard, and broadcasts
updated params. The TPU-native expression needs none of that choreography:
optimizer-state *pytree leaves are sharded over the 'data' mesh axis* via
NamedSharding. XLA then automatically:
  * reduce-scatters the gradients consumed by the sharded update,
  * all-gathers the updated params for the next forward,
which is exactly the ZeRO-1 communication schedule — derived by the
compiler from the sharding annotations instead of hand-written buckets
(greedy param→rank partition, :125, is subsumed by even axis chunking).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# Leaves below this many elements stay replicated. Two reasons: (a) the
# per-device memory win is negligible, and (b) sharding a tiny embedding
# table (SIE [cam,1,C], BN scales, cls token) on its feature dim makes GSPMD
# propagate that feature-dim sharding into the gather/broadcast activations
# it feeds, where it collides with the batch-dim sharding of the surrounding
# compute and forces an involuntary full rematerialization ([SPMD] warning).
_MIN_SHARD_ELEMS = 4096


def _leaf_spec(leaf: Any, data_size: int) -> P:
    """Shard the largest axis divisible by the data-axis size; tiny or
    indivisible leaves stay replicated (they carry no memory win)."""
    shape = getattr(leaf, "shape", ())
    if not shape or leaf.size < max(2 * data_size, _MIN_SHARD_ELEMS):
        return P()
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for ax in order:
        if shape[ax] % data_size == 0 and shape[ax] >= data_size:
            spec = [None] * len(shape)
            spec[ax] = "data"
            return P(*spec)
    return P()


def zero1_shardings(opt_state: Any, mesh: Mesh) -> Any:
    """Per-leaf NamedShardings for the optimizer state (ZeRO-1 partition)."""
    data_size = mesh.shape["data"]
    return jax.tree_util.tree_map(
        lambda leaf: NamedSharding(mesh, _leaf_spec(leaf, data_size)),
        opt_state)


def shard_opt_state(opt_state: Any, mesh: Mesh) -> Any:
    """Device-put an optimizer state with ZeRO-1 sharding."""
    sh = zero1_shardings(opt_state, mesh)
    return jax.tree_util.tree_map(jax.device_put, opt_state, sh)


def state_memory_bytes(opt_state: Any, per_device: bool, mesh: Mesh) -> int:
    """Diagnostic: bytes of optimizer state total vs per device under ZeRO-1."""
    total = sum(int(np.prod(l.shape)) * l.dtype.itemsize
                for l in jax.tree_util.tree_leaves(opt_state)
                if hasattr(l, "shape"))
    if not per_device:
        return total
    data_size = mesh.shape["data"]
    per = 0
    for leaf in jax.tree_util.tree_leaves(opt_state):
        if not hasattr(leaf, "shape"):
            continue
        n = int(np.prod(leaf.shape)) * leaf.dtype.itemsize
        spec = _leaf_spec(leaf, data_size)
        per += n // data_size if any(s == "data" for s in spec) else n
    return per
