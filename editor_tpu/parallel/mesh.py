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


def _arrange(devs: list, data: int, model: int) -> np.ndarray:
    """Topology-aware device layout: 'model' (the collective-heavy axis)
    gets ICI-adjacent chips via mesh_utils; multi-slice TPU jobs place the
    slice boundary on 'data' so only gradient all-reduce crosses DCN
    (hybrid mesh — the ICI/DCN recipe, NOT the reference's flat NCCL rank
    order, distributed/distributed_c10d.py:460)."""
    try:
        from jax.experimental import mesh_utils

        slices = {getattr(d, "slice_index", 0) for d in devs}
        s = len(slices)
        if s > 1 and data % s == 0:
            return mesh_utils.create_hybrid_device_mesh(
                (data // s, model), (s, 1), devices=devs)
        return mesh_utils.create_device_mesh((data, model), devices=devs)
    except (ImportError, ValueError, NotImplementedError, AssertionError) as e:
        # exotic topology mesh_utils can't factor — warn loudly: flat order
        # can route model-axis collectives over DCN on multi-slice jobs
        import logging
        logging.getLogger(__name__).warning(
            "topology-aware mesh layout failed (%s); falling back to flat "
            "device order", e)
        return np.asarray(devs).reshape(data, model)


def make_mesh(data: int = -1, model: int = 1,
              devices: Optional[list] = None) -> Mesh:
    """Create a ('data', 'model') mesh. data=-1 → all devices / model."""
    devs = devices if devices is not None else jax.devices()
    n = len(devs)
    if data == -1:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    return Mesh(_arrange(devs, data, model), axis_names=("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Device-put a host batch pytree with batch-axis sharding."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def shard_host_batch(mesh: Mesh, batch: Any) -> Any:
    """Assemble a GLOBAL batch-sharded pytree from each process's LOCAL
    rows (multi-host data parallelism: every host loads only its
    ``PKSampler.host_shard`` slice — the reference DDP sampler split,
    sampler_ddp.py:159-168 — and contributes it to the global array)."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        batch)
