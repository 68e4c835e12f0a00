import multiprocessing as mp
import os
import sys
import time

import numpy as np
import pytest


def _square(x):
    return x * x


def _make_counter():
    return 0


def _worker1(port, done_file):
    os.environ["JAX_PLATFORMS"] = "cpu"
    from editor_tpu.parallel import rpc
    rpc.init_rpc("worker1", rank=1, world_size=2, master_port=port,
                 timeout=120.0)
    # stay alive serving requests until the master signals completion
    deadline = time.time() + 120
    while not os.path.exists(done_file) and time.time() < deadline:
        time.sleep(0.2)
    rpc.shutdown()


def test_rpc_end_to_end(tmp_path):
    port = 29700 + (os.getpid() + int(time.time())) % 500
    done_file = str(tmp_path / "done")
    ctx = mp.get_context("spawn")
    p = ctx.Process(target=_worker1, args=(port, done_file), daemon=True)
    p.start()
    try:
        from editor_tpu.parallel import rpc
        rpc.init_rpc("master", rank=0, world_size=2, master_port=port,
                     timeout=120.0)
        # sync call
        assert rpc.rpc_sync("worker1", _square, (7,)) == 49
        # async call
        fut = rpc.rpc_async("worker1", _square, (9,))
        assert fut.result(timeout=10) == 81
        # rank addressing
        assert rpc.rpc_sync(1, _square, (3,)) == 9
        # RRef: create remote object, mutate via owner-side method, fetch
        rref = rpc.remote("worker1", _make_counter)
        rref.rpc_sync_method(lambda v, inc: v + inc, 5)
        rref.rpc_sync_method(lambda v, inc: v + inc, 2)
        assert rref.to_here() == 7
        # RemoteModule: linear layer living on worker1
        w = np.arange(6, dtype=np.float32).reshape(2, 3)
        module = rpc.RemoteModule(
            "worker1",
            init_fn=lambda: w,
            apply_fn=lambda params, x: x @ params,
        )
        out = module(np.ones((1, 2), np.float32))
        np.testing.assert_allclose(out, w.sum(axis=0, keepdims=True))
        # DistributedOptimizer: decay params on their owner
        opt = rpc.DistributedOptimizer(lambda p, lr: p * (1 - lr),
                                       [module.params_rref])
        opt.step(0.5)
        np.testing.assert_allclose(module.params_rref.to_here(), w * 0.5)

        # fault injection (reference faulty_agent_backend_registry.py:30-60):
        # user calls are dropped and NOT retried; rref fetches retry through
        # the injected drops and still succeed
        rpc.enable_fault_injection(messages_to_fail=("call",),
                                   num_fail_sends=2)
        with pytest.raises(rpc.FaultyRPCError):
            rpc.rpc_sync("worker1", _square, (4,))
        with pytest.raises(rpc.FaultyRPCError):
            rpc.rpc_sync("worker1", _square, (4,))
        assert rpc.rpc_sync("worker1", _square, (4,)) == 16  # budget spent
        rpc.enable_fault_injection(messages_to_fail=("fetch",),
                                   num_fail_sends=2)
        assert rref.to_here() == 7  # retried through 2 injected drops
        rpc.disable_fault_injection()

        # delay injection is observable in wall time
        rpc.enable_fault_injection(messages_to_fail=(),
                                   messages_to_delay={"call": 0.3})
        t0 = time.time()
        rpc.rpc_sync("worker1", _square, (2,))
        assert time.time() - t0 >= 0.3
        rpc.disable_fault_injection()

        # server-global profiler aggregates across server threads
        # (reference rpc/server_process_global_profiler.py:14) — profile
        # OUR server by having worker1 profile... simplest: profile this
        # process's handler by invoking a local self-call
        with rpc.server_process_global_profile() as prof:
            rpc.rpc_sync("master", _square, (5,))
            rpc.rpc_sync("master", _square, (6,))
        stats = prof.key_averages()
        assert stats["_square"]["count"] == 2
        assert stats["_square"]["mean_s"] >= 0
        assert len(prof.events()) == 2

        with open(done_file, "w") as f:
            f.write("done")
        rpc.shutdown()
    finally:
        with open(done_file, "w") as f:
            f.write("done")
        p.join(timeout=20)
        if p.is_alive():
            p.terminate()


def test_sharded_tensor_specs():
    from editor_tpu.parallel import make_mesh
    from editor_tpu.parallel.sharded_tensor import (
        ChunkShardingSpec, EnumerableShardingSpec, ShardMetadata,
        from_enumerable, shard_metadata_of, sharded_ones, sharded_rand,
        sharded_zeros)

    mesh = make_mesh(data=8, model=1)
    spec = ChunkShardingSpec(dim=0, axis="data")
    z = sharded_zeros(spec, (64, 16), mesh)
    metas = shard_metadata_of(z)
    assert len(metas) == 8
    assert all(m.shard_sizes == (8, 16) for m in metas)
    assert sorted(m.shard_offsets[0] for m in metas) == list(range(0, 64, 8))

    o = sharded_ones(ChunkShardingSpec(dim=1, axis="data"), (4, 32), mesh)
    assert float(o.sum()) == 128.0
    r = sharded_rand(spec, (16, 8), mesh, seed=3)
    assert np.asarray(r).std() > 0

    # enumerable: explicit shard table with validation
    shards = tuple(ShardMetadata((i * 8, 0), (8, 4), i) for i in range(8))
    espec = EnumerableShardingSpec(shards)
    arr = from_enumerable(espec, (64, 4),
                          lambda m: np.full(m.shard_sizes,
                                            m.shard_offsets[0], np.float32),
                          mesh)
    np.testing.assert_allclose(np.asarray(arr)[:, 0],
                               np.repeat(np.arange(0, 64, 8), 8))
    bad = EnumerableShardingSpec(shards[:4])
    with pytest.raises(ValueError):
        bad.validate((64, 4))


def test_launcher_cli(tmp_path):
    from editor_tpu.cli.launch import main
    script = tmp_path / "worker.py"
    script.write_text(
        "import os\n"
        "rank = int(os.environ['NODE_RANK']) * int(os.environ['NPROC_PER_NODE'])"
        " + int(os.environ['LOCAL_RANK'])\n"
        "print('worker rank', rank, 'world', os.environ['WORLD_SIZE'])\n")
    restarts = main(["--nproc_per_node", "2", "--max_restarts", "0",
                     "--monitor_interval", "0.2",
                     "--error_dir", str(tmp_path / "err"),
                     "--", sys.executable, str(script)])
    assert restarts == 0
