"""Multi-host e2e worker: REAL multi-process ``jax.distributed.initialize``.

Launched (2 OS processes on one box) by ``editor_tpu.cli.launch`` with the
c10d dynamic rendezvous — the JAX analogue of torchrun workers entering
``init_process_group`` (reference: distributed/distributed_c10d.py:460-614,
distributed/run.py:696; gloo-on-one-box pattern, distributed/rendezvous.py:54).

Each process:
  1. negotiates its node rank through ``parallel/rendezvous.py`` (the
     launcher side) and receives the rank-0 coordinator address via the
     store,
  2. calls ``parallel.multihost.initialize()`` (torch-style env contract)
     → the JAX coordination service connects the processes,
  3. builds ONE global ('data',) mesh over BOTH processes' CPU devices
     (2 local × 2 processes = 4 global),
  4. runs ≥2 real EDITOR train steps with per-process data sharding
     (``PKSampler.host_shard`` → ``jax.make_array_from_process_local_data``)
     and rank-0 Orbax checkpointing,
  5. writes its observed losses for the test to assert cross-process
     agreement and parity with a single-process oracle
     (tests/test_multihost.py).

Run as ``python -m tests.multihost_worker OUTDIR`` with cwd = repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

DATASET_N = 16
BATCH = 8
STEPS = 2
ELASTIC_STEPS = 4          # --elastic mode trains 2 epochs x 2 batches
IMG = (64, 32)


def make_setup():
    """Tiny flagship-shaped EDITOR config shared by workers and the oracle
    (drop-path active: the per-layer draws come from the state rng, so the
    multi-process run and the oracle see identical masks)."""
    from editor_tpu.config import Config
    from editor_tpu.models import EditorConfig, ViTConfig

    vit = ViTConfig(img_size=IMG, patch_size=16, stride_size=(16, 16),
                    embed_dim=96, depth=2, num_heads=4, mlp_ratio=2.0,
                    camera=2, drop_path_rate=0.1)
    ecfg = EditorConfig(num_classes=4, vit=vit, head_keep=2,
                        frequency_keep=3, use_pallas=False)
    return Config(), ecfg


def synth_items():
    """(name, pid, camid) records for the PK sampler — 4 ids × 4 images."""
    return [(f"img{i}", i % 4, 0) for i in range(DATASET_N)]


def _image_for(idx: int) -> np.ndarray:
    r = np.random.RandomState(1000 + idx)
    return r.randn(IMG[0], IMG[1], 3).astype(np.float32)


def batch_rows(indices, items):
    imgs = np.stack([_image_for(int(i)) for i in indices])
    return {
        "RGB": imgs,
        "NI": (imgs * 0.5).astype(np.float32),
        "TI": (imgs * -0.25).astype(np.float32),
        "pid": np.asarray([items[int(i)][1] for i in indices]),
        "camid": np.zeros(len(indices), np.int32),
    }


def make_sampler(items):
    from editor_tpu.data.sampler import PKSampler
    return PKSampler(items, batch_size=BATCH, num_instances=2, seed=3)


def _build_step(mesh=None):
    import jax
    import jax.numpy as jnp

    from editor_tpu.engine import build_train_step, make_train_state
    from editor_tpu.losses import make_loss
    from editor_tpu.models.editor import editor_init
    from editor_tpu.solver import make_optimizer, make_scheduler

    cfg, ecfg = make_setup()
    loss_func = make_loss(cfg, ecfg.num_classes)
    lr_fn = make_scheduler(cfg)
    params, _ = editor_init(jax.random.PRNGKey(0), ecfg)
    opt = make_optimizer(cfg, params)
    state = make_train_state(jax.random.PRNGKey(0), ecfg, opt)
    step = build_train_step(ecfg, opt, loss_func, lr_fn, cfg.SOLVER.BASE_LR,
                            compute_dtype=jnp.float32, mesh=mesh,
                            donate=False)
    return state, step


def oracle_losses():
    """Single-process reference: the same 2 steps on the same global
    batches, plain jit — what every multi-process rank must reproduce."""
    import jax
    import jax.numpy as jnp

    items = synth_items()
    sampler = make_sampler(items)
    full = sampler.epoch_indices(1)
    state, step = _build_step()
    losses = []
    for b in range(STEPS):
        batch = {k: jnp.asarray(v)
                 for k, v in batch_rows(full[b * BATCH:(b + 1) * BATCH],
                                        items).items()}
        state, metrics = step(state, batch, jnp.asarray(1))
        losses.append(float(metrics["loss"]))
    return losses


def _rows_for_step(sampler, items, b: int, rank: int, world: int):
    """This process's rows of global batch ``b`` — 2 batches per epoch
    (DATASET_N/BATCH), so step b lives in epoch 1 + b//2 at offset b%2.
    Indexing by absolute step keeps the data schedule identical across
    crash/restart incarnations (and for the single-process oracle)."""
    epoch, off = 1 + b // 2, b % 2
    per = BATCH // world
    mine = sampler.host_shard(epoch, rank, world)
    return batch_rows(mine[off * per:(off + 1) * per], items)


def oracle_losses_elastic(n_steps: int = ELASTIC_STEPS):
    """Uninterrupted single-process run of the elastic step schedule. The
    global batch of step b is world-size independent (host_shard blocks
    reassemble it), so this single oracle also certifies runs whose world
    size CHANGED mid-training (scale-up/scale-down e2es)."""
    import jax.numpy as jnp

    items = synth_items()
    sampler = make_sampler(items)
    state, step = _build_step()
    losses = []
    for b in range(n_steps):
        batch = {k: jnp.asarray(v)
                 for k, v in _rows_for_step(sampler, items, b, 0, 1).items()}
        state, metrics = step(state, batch, jnp.asarray(1 + b // 2))
        losses.append(float(metrics["loss"]))
    return losses


def main_elastic(outdir: str) -> None:
    """Crash/restart-all/resume incarnation of the multi-process worker —
    the TPU-native torchelastic recovery model (checkpoint-restart,
    reference elastic/agent/server/api.py:827-884 monitor loop +
    local_timer/_reap semantics; SURVEY.md §5.3).

    Every step ends with a COLLECTIVE checkpoint save. On incarnation 0 the
    process with rank MH_CRASH_RANK dies (``os._exit``) right after step
    MH_CRASH_AFTER_STEP's checkpoint commits — the surviving peer blocks in
    the next collective until the supervisor's restart-all reaps it. The
    restarted incarnation restores the latest checkpoint on every process
    and finishes the remaining steps; the test stitches the two incarnations
    together and asserts loss parity with an uninterrupted oracle."""
    import jax

    jax.config.update("jax_platforms", "cpu")

    from editor_tpu.parallel import multihost

    multihost.initialize()

    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from editor_tpu.utils.checkpoint import CheckpointManager

    rank = multihost.process_index()
    world = multihost.process_count()
    restart = int(os.environ.get("EDITOR_TPU_RESTART_COUNT", "0"))
    crash_rank = int(os.environ.get("MH_CRASH_RANK", "-1"))
    crash_after = int(os.environ.get("MH_CRASH_AFTER_STEP", "-1"))
    n_steps = int(os.environ.get("MH_TOTAL_STEPS", str(ELASTIC_STEPS)))
    # scale-up/down e2es pace the loop so membership events land while
    # training is genuinely in flight, not in a compile or a tail
    sleep_per_step = float(os.environ.get("MH_SLEEP_PER_STEP", "0"))

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P("data"))

    state, step = _build_step(mesh)
    state = jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), state)

    cm = CheckpointManager(os.path.join(outdir, "ckpt_elastic"),
                           max_to_keep=2)
    start = 0
    if cm.latest_step() is not None:
        state = cm.restore(template=state)
        start = int(np.asarray(state.step))

    items = synth_items()
    sampler = make_sampler(items)
    losses = []
    for b in range(start, n_steps):
        local = _rows_for_step(sampler, items, b, rank, world)
        gb = {k: jax.make_array_from_process_local_data(data_sh, v)
              for k, v in local.items()}
        state, metrics = step(state, gb, jnp.asarray(1 + b // 2))
        losses.append(float(metrics["loss"]))
        cm.save(b + 1, state, force=True)
        cm.wait()
        if sleep_per_step:
            time.sleep(sleep_per_step)
        if restart == 0 and rank == crash_rank and b == crash_after:
            # record what this incarnation saw, then die without cleanup
            # (the peer is now blocked in a collective; the supervisor's
            # failure detection + restart-all is what frees it)
            with open(os.path.join(
                    outdir, f"elastic_rank{rank}_r{restart}.json"),
                    "w") as f:
                json.dump({"start": start, "losses": losses}, f)
            os._exit(17)
    cm.close()

    with open(os.path.join(outdir, f"elastic_rank{rank}_r{restart}.json"),
              "w") as f:
        json.dump({"start": start, "losses": losses,
                   "world": world, "ndev_global": jax.device_count()}, f)
    print(f"elastic worker rank {rank}/{world} r{restart}: "
          f"start={start} losses={losses}", flush=True)
    multihost.shutdown()


def main(outdir: str) -> None:
    import jax

    # the ambient sitecustomize pins the tunneled TPU platform; this worker
    # is a CPU-cluster process (same bootstrap as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")

    from editor_tpu.parallel import multihost

    # torch-style env contract set by editor_tpu.cli.launch
    # (MASTER_ADDR/PORT, WORLD_SIZE, NODE_RANK×NPROC+LOCAL_RANK)
    multihost.initialize()

    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    rank = multihost.process_index()
    world = multihost.process_count()
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P("data"))

    state, step = _build_step(mesh)
    state = jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), state)

    items = synth_items()
    sampler = make_sampler(items)
    # per-process contiguous block of every global batch (the reference DDP
    # sampler split, sampler_ddp.py:159-168) — block order matches the
    # process-major global device order, so local rows land on local shards
    mine = sampler.host_shard(1, rank, world)
    per = BATCH // world
    # a host control-plane value shared from process 0 (the reference's
    # pickled shared-seed all_gather, sampler_ddp.py:64-109)
    shared_seed = multihost.broadcast_host_value(1234 + rank)
    assert shared_seed == 1234, shared_seed

    losses = []
    for b in range(STEPS):
        local = batch_rows(mine[b * per:(b + 1) * per], items)
        gb = {k: jax.make_array_from_process_local_data(data_sh, v)
              for k, v in local.items()}
        state, metrics = step(state, gb, jnp.asarray(1))
        losses.append(float(metrics["loss"]))

    # checkpointing is a COLLECTIVE in multi-process JAX: every process
    # enters the Orbax save and the primary host does the writing — the
    # JAX-native form of the reference's rank-0 torch.save (a rank-0-only
    # call would desynchronize Orbax's internal barriers)
    from editor_tpu.utils.checkpoint import CheckpointManager
    ckpt_dir = os.path.join(outdir, "ckpt")
    cm = CheckpointManager(ckpt_dir, max_to_keep=1)
    cm.save(STEPS, state, force=True)
    cm.wait()
    cm.close()
    ckpt_path = ckpt_dir if multihost.is_primary() else None

    with open(os.path.join(outdir, f"result_rank{rank}.json"), "w") as f:
        json.dump({
            "rank": rank,
            "world": world,
            "ndev_local": jax.local_device_count(),
            "ndev_global": jax.device_count(),
            "losses": losses,
            "ckpt": ckpt_path,
        }, f)
    print(f"worker rank {rank}/{world}: losses={losses}", flush=True)
    # destroy_process_group equivalent: absorb exit skew (rank 0 was just
    # checkpointing) so no process trips the service's shutdown barrier
    multihost.shutdown()


if __name__ == "__main__":
    if sys.argv[1] == "--elastic":
        main_elastic(sys.argv[2])
    else:
        main(sys.argv[1])
