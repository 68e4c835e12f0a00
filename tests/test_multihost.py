"""Multi-host substrate e2e: N OS processes → rendezvous →
``jax.distributed.initialize`` → global-mesh EDITOR training (round-3
verdict task 1).

Two launcher processes (``editor_tpu.cli.launch``, the torchrun equivalent,
reference distributed/run.py:696) each join the c10d dynamic rendezvous on
one box, elect node ranks, publish the rank-0 JAX coordinator address
through the store, and spawn one worker each
(tests/multihost_worker.py). The workers form a REAL 2-process JAX CPU
cluster (reference ``init_process_group`` across torchrun workers,
distributed/distributed_c10d.py:460-614), build one global 4-device
('data',) mesh, and train the real EDITOR for 2 steps with per-process
data sharding + rank-0 checkpointing. The test asserts every process saw
the whole cluster, both agree on the per-step losses, the losses match a
single-process oracle, and the checkpoint restores.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_multihost_two_process_editor_training(tmp_path):
    rdzv_port, master_port = _free_port(), _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(
        flags + ["--xla_force_host_platform_device_count=2"])

    cmd = [sys.executable, "-m", "editor_tpu.cli.launch",
           "--nnodes", "2", "--nproc_per_node", "1",
           "--rdzv_backend", "c10d",
           "--rdzv_endpoint", f"127.0.0.1:{rdzv_port}",
           "--rdzv_id", "mh_e2e",
           "--master_port", str(master_port),
           "--max_restarts", "0",
           "--", sys.executable, "-m", "tests.multihost_worker",
           str(tmp_path)]
    logs = [open(tmp_path / f"launcher{i}.log", "w") for i in range(2)]
    procs = [subprocess.Popen(cmd, cwd=REPO_ROOT, env=env, stdout=log,
                              stderr=subprocess.STDOUT)
             for log in logs]
    try:
        for p in procs:
            assert p.wait(timeout=600) == 0, (
                "launcher failed:\n" + "\n".join(
                    (tmp_path / f"launcher{i}.log").read_text()[-4000:]
                    for i in range(2)))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        for log in logs:
            log.close()

    results = []
    for r in range(2):
        path = tmp_path / f"result_rank{r}.json"
        assert path.exists(), (
            f"rank {r} wrote no result\n"
            + (tmp_path / "launcher0.log").read_text()[-4000:])
        results.append(json.loads(path.read_text()))

    # every process saw the WHOLE cluster: 2 local devices, 4 global
    for res in results:
        assert res["world"] == 2
        assert res["ndev_local"] == 2
        assert res["ndev_global"] == 4
        assert len(res["losses"]) == 2

    # cross-process agreement: the jitted step's loss is a global (psum'd)
    # scalar — both processes must read the identical value
    np.testing.assert_allclose(results[0]["losses"], results[1]["losses"],
                               rtol=1e-6)

    # parity with a single-process run of the same global batches
    from tests.multihost_worker import oracle_losses
    ref = oracle_losses()
    np.testing.assert_allclose(results[0]["losses"], ref, rtol=3e-4)

    # rank-0 checkpoint exists and restores to a state with the right step
    from tests.multihost_worker import STEPS, _build_step
    from editor_tpu.utils.checkpoint import CheckpointManager
    ckpt = [r["ckpt"] for r in results if r["ckpt"]]
    assert len(ckpt) == 1  # exactly one primary wrote it
    template, _ = _build_step()
    cm = CheckpointManager(ckpt[0])
    restored = cm.restore(template=template)
    assert int(np.asarray(restored.step)) == STEPS
    cm.close()
