"""Multi-host coordination (DCN control plane).

TPU-native replacement for c10d rendezvous + init_process_group
(reference: distributed/distributed_c10d.py:460-614, rendezvous.py:54-239):
``jax.distributed.initialize`` starts/joins the JAX coordination service —
the env:// pattern (MASTER_ADDR/PORT, RANK, WORLD_SIZE) maps onto
coordinator_address/process_id/num_processes. No NCCL/Gloo backends: the
data plane is ICI/DCN collectives compiled by XLA.

The DDP sampler's pickled shared-seed all_gather (sampler_ddp.py:64-109) is
replaced by broadcast_host_value: a tiny device all-gather of a scalar.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """init_process_group equivalent. Args fall back to torch-style env vars
    (MASTER_ADDR/MASTER_PORT/WORLD_SIZE/RANK) for drop-in launch scripts."""
    if coordinator_address is None and "MASTER_ADDR" in os.environ:
        coordinator_address = (f"{os.environ['MASTER_ADDR']}:"
                               f"{os.environ.get('MASTER_PORT', '12355')}")
    if num_processes is None and "WORLD_SIZE" in os.environ:
        num_processes = int(os.environ["WORLD_SIZE"])
    if process_id is None and "RANK" in os.environ:
        process_id = int(os.environ["RANK"])
    if process_id is None and "LOCAL_RANK" in os.environ:
        # launched by editor_tpu.cli.launch: derive the global rank
        process_id = (int(os.environ.get("NODE_RANK", "0"))
                      * int(os.environ.get("NPROC_PER_NODE", "1"))
                      + int(os.environ["LOCAL_RANK"]))
    if coordinator_address is None:
        return  # single-process
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def barrier(name: str = "editor_tpu_barrier") -> None:
    """Cross-process host barrier (reference ``dist.barrier``) — a tiny
    device all-gather under the hood; no-op single-process."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)


def shutdown(graceful: bool = True) -> None:
    """``destroy_process_group`` equivalent (reference
    distributed_c10d.py:destroy_process_group): barrier so no process
    leaves while peers still dispatch collectives, then disconnect from
    the coordination service. Without the barrier, exit skew (e.g. rank 0
    still writing a checkpoint) trips the service's shutdown barrier and
    kills the faster process.

    ``graceful=False`` is for a FAILING rank: both the barrier and the
    coordination-service disconnect are themselves collective handshakes,
    so running them from the exception path would park this process while
    its peers sit in a train-step collective — a cluster-wide deadlock the
    elastic agent can never observe (a failing rank should use
    :func:`fail_fast`, which also sidesteps the collective atexit/teardown
    hooks)."""
    if jax.process_count() > 1:
        if not graceful:
            return
        barrier("editor_tpu_shutdown")
        jax.distributed.shutdown()


def fail_fast(exc: BaseException, exit_code: int = 1,
              write_error: bool = True) -> None:
    """Terminate a FAILING rank of a multi-process job immediately.

    On a failing rank every clean-exit path is collective and therefore
    deadlocks while peers sit in a train-step collective: the shutdown
    barrier, the coordination-service disconnect handshake, JAX's atexit
    ``clean_up`` (which re-runs the disconnect), and even the distributed
    client's C++ destructor at interpreter teardown. So: write the elastic
    error file (EDITOR_TPU_ERROR_FILE contract), flush the traceback, and
    ``os._exit`` — the agent sees the nonzero exit within one monitor tick
    and drives restart/re-rendezvous; the coordinator's heartbeat timeout
    tears down the surviving ranks (reference: torch workers crash out and
    the agent reaps, elastic/agent/server/api.py:844-870).

    ``write_error=False`` is for DELIBERATE exits (``sys.exit``, Ctrl+C)
    that still need the no-collective-teardown exit path but are not
    worker faults: no error file is written, so the elastic agent does
    not burn a restart-budget slot on them."""
    import sys
    import traceback

    from editor_tpu.parallel.elastic import write_error_file
    try:
        if write_error:
            write_error_file(exc)
        traceback.print_exception(exc)
    finally:
        sys.stderr.flush()
        sys.stdout.flush()
        os._exit(exit_code)


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_primary() -> bool:
    return jax.process_index() == 0


def broadcast_host_value(value: int, mesh=None) -> int:
    """Share a host scalar (e.g. a sampling seed) from process 0 to all —
    replaces the reference's gloo pickled-object all_gather
    (sampler_ddp.py:64-109)."""
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    if jax.process_count() == 1:
        return int(value)
    arr = multihost_utils.broadcast_one_to_all(np.asarray(value, np.int64))
    return int(arr)
