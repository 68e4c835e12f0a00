"""Device mesh construction and sharding helpers.

TPU-native replacement for the reference's c10d process-group world
(reference: distributed/distributed_c10d.py:460-614): instead of one process
per GPU + NCCL collectives, a ('data', 'model') ``jax.sharding.Mesh`` spans
all chips; gradient all-reduce is implicit in pjit when the batch is sharded
over 'data' and params are replicated (the DDP equivalent,
engine/processor.py:47-50). The 'model' axis is the TP hook (unused at ReID
scale, plumbed so larger backbones can shard qkv/mlp weights over it).

Multi-host: call ``editor_tpu.parallel.multihost.initialize()`` first
(jax.distributed over DCN), then make_mesh spans all global devices with the
mesh laid out so 'data' rides ICI within a slice.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, model: int = 1,
              devices: Optional[list] = None) -> Mesh:
    """Create a ('data', 'model') mesh. data=-1 → all devices / model."""
    devs = devices if devices is not None else jax.devices()
    n = len(devs)
    if data == -1:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devs).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Device-put a host batch pytree with batch-axis sharding."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
