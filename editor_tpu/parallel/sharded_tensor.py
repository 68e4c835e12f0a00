"""Sharded tensors: chunk/enumerable sharding specs over the mesh.

reference: distributed/_sharded_tensor/api.py:177 (ShardedTensor),
_sharding_spec/api.py:45,89 (ChunkShardingSpec / EnumerableShardingSpec).
The reference builds these on RPC handshakes between ranks; on TPU the
same contract is a *NamedSharding translation layer*: a spec maps onto a
PartitionSpec over a mesh axis and jax places/addresses the shards. The
init ops (empty/zeros/ones/rand) mirror the reference's factory surface.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class ChunkShardingSpec:
    """Single-dim even chunking across devices (reference: _sharding_spec/
    api.py:45). ``placements`` is implicit — the mesh axis enumerates them."""
    dim: int
    axis: str = "data"

    def named_sharding(self, mesh: Mesh, ndim: int) -> NamedSharding:
        spec = [None] * ndim
        spec[self.dim] = self.axis
        return NamedSharding(mesh, P(*spec))


@dataclasses.dataclass(frozen=True)
class ShardMetadata:
    """reference: _sharding_spec/api.py ShardMetadata."""
    shard_offsets: Tuple[int, ...]
    shard_sizes: Tuple[int, ...]
    device_index: int


@dataclasses.dataclass(frozen=True)
class EnumerableShardingSpec:
    """Explicit per-shard placement (reference: _sharding_spec/api.py:89).
    Shards must tile the tensor exactly (validated like _internals.py:8)."""
    shards: Tuple[ShardMetadata, ...]

    def validate(self, shape: Sequence[int]) -> None:
        total = int(np.prod(shape))
        covered = 0
        for s in self.shards:
            if len(s.shard_offsets) != len(shape):
                raise ValueError("shard rank mismatch")
            for o, sz, dim in zip(s.shard_offsets, s.shard_sizes, shape):
                if o < 0 or o + sz > dim:
                    raise ValueError(f"shard [{o}:{o+sz}] exceeds dim {dim}")
            covered += int(np.prod(s.shard_sizes))
        if covered != total:
            raise ValueError("shards do not tile the tensor")


def _make(spec: ChunkShardingSpec, shape, mesh: Mesh, fill) -> jax.Array:
    sharding = spec.named_sharding(mesh, len(shape))
    return jax.jit(fill, out_shardings=sharding)()


def sharded_zeros(spec: ChunkShardingSpec, shape, mesh: Mesh,
                  dtype=jnp.float32) -> jax.Array:
    return _make(spec, shape, mesh, lambda: jnp.zeros(shape, dtype))


def sharded_ones(spec: ChunkShardingSpec, shape, mesh: Mesh,
                 dtype=jnp.float32) -> jax.Array:
    return _make(spec, shape, mesh, lambda: jnp.ones(shape, dtype))


def sharded_full(spec: ChunkShardingSpec, shape, value, mesh: Mesh,
                 dtype=jnp.float32) -> jax.Array:
    return _make(spec, shape, mesh, lambda: jnp.full(shape, value, dtype))


def sharded_rand(spec: ChunkShardingSpec, shape, mesh: Mesh, seed: int = 0,
                 dtype=jnp.float32) -> jax.Array:
    key = jax.random.PRNGKey(seed)
    return _make(spec, shape, mesh,
                 lambda: jax.random.uniform(key, shape, dtype))


def from_enumerable(spec: EnumerableShardingSpec, shape,
                    host_fill, mesh: Mesh, dtype=jnp.float32) -> jax.Array:
    """Build a global array from explicitly placed per-shard host data.
    ``host_fill(meta) -> np.ndarray`` provides each shard's contents."""
    spec.validate(shape)
    devices = list(mesh.devices.flat)
    # only regular single-dim tilings are mappable onto NamedSharding; find it
    dims = [i for i in range(len(shape))
            if any(s.shard_offsets[i] != 0 for s in spec.shards)]
    if len(dims) != 1:
        raise ValueError("only single-dim enumerable layouts supported")
    dim = dims[0]
    order = sorted(spec.shards, key=lambda s: s.shard_offsets[dim])
    data = np.concatenate([np.asarray(host_fill(s), dtype) for s in order],
                          axis=dim)
    sharding = ChunkShardingSpec(dim=dim, axis=mesh.axis_names[0]) \
        .named_sharding(mesh, len(shape))
    return jax.device_put(jnp.asarray(data), sharding)


def shard_metadata_of(arr: jax.Array) -> List[ShardMetadata]:
    """Introspect an array's shard layout (ShardedTensor.metadata analogue)."""
    out = []
    for sh in arr.addressable_shards:
        offsets = tuple(idx.start or 0 for idx in sh.index)
        out.append(ShardMetadata(offsets, tuple(sh.data.shape),
                                 sh.device.id))
    return out
