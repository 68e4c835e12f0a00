"""Full training loop orchestration (``do_train`` equivalent).

reference: engine/processor.py:23-214. Differences (TPU-first):
  * step = one jitted call with in-step augmentation; host only reads metrics
    every LOG_PERIOD (no per-iter device sync);
  * eval pads the tail batch to a static shape, trimmed before the evaluator;
  * checkpoints are full train state (exact resume) + best-mAP snapshot.
"""

from __future__ import annotations

import functools
import os
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from editor_tpu.data.loader import ReIDDataModule
from editor_tpu.data.transforms import make_eval_transform, make_train_augment
from editor_tpu.engine.evaluate import build_eval_step
from editor_tpu.engine.train import TrainState, build_train_step, make_train_state
from editor_tpu.evals.metrics import R1mAPEvaluator
from editor_tpu.losses import make_loss
from editor_tpu.models.editor import EditorConfig, editor_config_from, editor_init
from editor_tpu.parallel.mesh import make_mesh, shard_batch, shard_host_batch
from editor_tpu.solver import make_optimizer, make_scheduler
from editor_tpu.utils.logger import MetricWriter, setup_logger
from editor_tpu.utils.meter import AverageMeter


_EVAL_STEP_CACHE: dict = {}


@functools.lru_cache(maxsize=8)
def _leaf_replicator(mesh):
    """One cached jitted identity per mesh that reshards a single leaf to
    fully-replicated — compiled once per (mesh, leaf shape) instead of a
    fresh ``jax.jit(lambda)`` per checkpoint save."""
    from jax.sharding import NamedSharding, PartitionSpec
    rep = NamedSharding(mesh, PartitionSpec())
    return jax.jit(lambda x: x, out_shardings=rep)


def _ckpt_state(state, ecfg, tp: int, mesh=None):
    """Host copy of the train state in the CANONICAL qkv layout — TP runs
    un-permute before writing so checkpoints are layout-portable.

    Multi-process gather happens LEAF BY LEAF: ZeRO/TP shards live on
    other processes' devices (``device_get`` on a non-fully-addressable
    array raises), but replicating the WHOLE state on every device first
    would materialize exactly the footprint ZeRO shards to avoid. Per
    leaf the transient device cost is one replicated leaf (freed before
    the next), so peak memory stays sharded-state + max-leaf. Collective
    — every process calls this on the same state."""
    if jax.process_count() > 1 and mesh is not None:
        rep_fn = _leaf_replicator(mesh)

        def leaf_to_host(x):
            y = rep_fn(x)
            h = np.asarray(y)
            y.delete()  # free the replicated device copy immediately
            return h

        host = jax.tree_util.tree_map(leaf_to_host, state)
    else:
        host = jax.device_get(state)
    if tp > 1:
        from editor_tpu.parallel.tp import permute_train_state
        host = permute_train_state(host, ecfg.vit.num_heads, tp,
                                   inverse=True)
    return host


def evaluate(cfg, ecfg: EditorConfig, state: TrainState, dm: ReIDDataModule,
             mesh=None, compute_dtype=jnp.bfloat16):
    """Feature-extraction eval pass → (cmc, mAP)."""
    # build_eval_step returns a fresh jax.jit closure; cache it so repeated
    # per-epoch evals reuse one compilation instead of recompiling each call.
    # Keyed by value (EditorConfig is frozen/hashable, jax Mesh hashes by
    # devices+axis names) — id() keys could alias a dead config after GC.
    key = (ecfg, str(compute_dtype), mesh)
    eval_step = _EVAL_STEP_CACHE.get(key)
    if eval_step is None:
        eval_step = build_eval_step(ecfg, compute_dtype, mesh)
        _EVAL_STEP_CACHE[key] = eval_step
    transform = make_eval_transform(cfg.INPUT)
    evaluator = R1mAPEvaluator(
        dm.num_query,
        feat_norm=cfg.TEST.FEAT_NORM == "yes",
        reranking=cfg.TEST.RE_RANKING == "yes",
        msvr_protocol=dm.splits.has_sceneid,
        # MSVR310 rank-list artifact (the reference's `re.txt`,
        # utils/metrics.py:59-99) — written under OUTPUT_DIR, not cwd, and
        # by process 0 only (all ranks run the collective eval; concurrent
        # writers on a shared filesystem would interleave the file)
        rank_list_path=(os.path.join(cfg.OUTPUT_DIR, "re.txt")
                        if dm.splits.has_sceneid and cfg.OUTPUT_DIR
                        and jax.process_index() == 0 else None),
    )
    total = len(dm.val_items)
    seen = 0
    for batch in dm.val_batches():
        imgs = {k: transform(jnp.asarray(batch[k]))
                for k in ("RGB", "NI", "TI") if k in batch}
        feed = dict(imgs, camid=jnp.asarray(batch["camid"]))
        if mesh is not None:
            feed = shard_batch(mesh, feed)
        out = eval_step(state.params, state.model_state, feed)
        if jax.process_count() > 1:
            # multi-process: the feature output is data-sharded across
            # processes — gather it so the host-side evaluator sees all rows
            from jax.experimental import multihost_utils
            feat = np.asarray(multihost_utils.process_allgather(out,
                                                                tiled=True))
        else:
            feat = np.asarray(out)
        take = min(len(feat), total - seen)  # trim static-shape padding
        evaluator.update(feat[:take], batch["pid"][:take],
                         batch["camid"][:take],
                         batch.get("sceneid", [None] * len(feat))[:take]
                         if "sceneid" in batch else None)
        seen += take
    cmc, mAP, *_ = evaluator.compute()
    return cmc, mAP


def do_train(cfg, dm: Optional[ReIDDataModule] = None,
             mesh=None, decode_fn=None,
             max_steps_per_epoch: Optional[int] = None) -> Dict[str, Any]:
    """Train EDITOR per the config; returns {'state', 'best', 'ecfg'}.

    Multi-process aware (call ``parallel.multihost.initialize()`` first —
    ``cli.train`` does): the mesh spans all processes' devices, every host
    loads only its ``PKSampler.host_shard`` slice and contributes it to the
    global batch (``shard_host_batch``), rank 0 owns the log/metric files,
    and checkpointing/eval are collective (every process participates;
    Orbax's primary host writes)."""
    nproc = jax.process_count()
    rank = jax.process_index()
    primary = rank == 0
    logger = setup_logger("editor_tpu.train", cfg.OUTPUT_DIR,
                          "train_log.txt", distributed_rank=rank)
    writer = MetricWriter(cfg.OUTPUT_DIR if primary else None,
                          tensorboard=cfg.TPU.TENSORBOARD)
    dm = dm or ReIDDataModule(cfg, decode_fn=decode_fn)
    ecfg = editor_config_from(cfg, dm.num_classes, dm.cam_num)
    compute_dtype = jnp.dtype(cfg.TPU.COMPUTE_DTYPE)

    if mesh is None and (cfg.TPU.MESH_DATA != 1 or cfg.TPU.MESH_MODEL != 1):
        try:
            mesh = make_mesh(cfg.TPU.MESH_DATA, cfg.TPU.MESH_MODEL)
        except ValueError:
            mesh = None  # single device
    if nproc > 1 and mesh is None:
        # multi-process training always needs the global mesh — span every
        # process's devices even when the config left MESH_DATA at 1
        mesh = make_mesh(-1, max(1, cfg.TPU.MESH_MODEL))

    loss_func = make_loss(cfg, dm.num_classes)
    lr_fn = make_scheduler(cfg)
    key = jax.random.PRNGKey(cfg.SOLVER.SEED)
    params, _ = editor_init(key, ecfg)
    if cfg.MODEL.PRETRAIN_CHOICE == "imagenet" and os.path.exists(
            cfg.MODEL.PRETRAIN_PATH_T):
        from editor_tpu.utils.torch_convert import load_imagenet_vit
        params["BACKBONE"] = load_imagenet_vit(
            cfg.MODEL.PRETRAIN_PATH_T, ecfg.vit, params["BACKBONE"])
        logger.info("Loaded ImageNet backbone from %s", cfg.MODEL.PRETRAIN_PATH_T)
    tp = mesh.shape.get("model", 1) if mesh is not None else 1
    if tp > 1:
        # shard-major qkv column layout so each Megatron shard is a
        # self-contained [q|k|v] block for its own heads (parallel/tp.py) —
        # the fused attention kernels then run per-shard via shard_map.
        # Checkpoints are still written in the CANONICAL layout (see
        # _ckpt_state below), so they load into non-TP runs and any tp.
        from editor_tpu.parallel.tp import permute_qkv_params
        params = permute_qkv_params(params, ecfg.vit.num_heads, tp)
    opt = make_optimizer(cfg, params)
    state = make_train_state(key, ecfg, opt)
    state = TrainState(params=params, opt_state=opt.init(params),
                       model_state=state.model_state, rng=state.rng,
                       step=state.step)

    augment = make_train_augment(cfg.INPUT)
    ddp_wrap = None
    state_shardings = None
    if mesh is not None and cfg.TPU.GRAD_COMPRESSION not in ("none", ""):
        # compressed gradient all-reduce needs the explicit shard_map step
        from editor_tpu.parallel.compression import make_reducer
        from editor_tpu.parallel.ddp import build_ddp_train_step, make_ddp_state
        reducer = make_reducer(cfg.TPU.GRAD_COMPRESSION,
                               rank=cfg.TPU.POWERSGD_RANK)
        raw_step = build_ddp_train_step(
            ecfg, opt, loss_func, lr_fn, cfg.SOLVER.BASE_LR, mesh,
            reducer=reducer, compute_dtype=compute_dtype, augment=augment)
        from editor_tpu.parallel.ddp import DDPState
        comm_box = {"comm": reducer.init(state.params)}

        def step(s, batch, epoch):
            new_dd, metrics = raw_step(DDPState(train=s, comm=comm_box["comm"]),
                                       batch, epoch)
            comm_box["comm"] = new_dd.comm
            return new_dd.train, metrics
    else:
        if mesh is not None and cfg.TPU.ZERO_STAGE == 1:
            from editor_tpu.engine.train import zero1_state_shardings
            state_shardings = zero1_state_shardings(state, mesh)
            state = jax.tree_util.tree_map(jax.device_put, state,
                                           state_shardings)
            logger.info("ZeRO-1: optimizer state sharded over the data axis")
        elif mesh is not None and cfg.TPU.ZERO_STAGE == 3:
            from editor_tpu.engine.train import fsdp_state_shardings
            state_shardings = fsdp_state_shardings(state, mesh)
            state = jax.tree_util.tree_map(jax.device_put, state,
                                           state_shardings)
            logger.info("FSDP/ZeRO-3: params + optimizer state sharded over "
                        "the data axis")
        elif mesh is not None and mesh.shape.get("model", 1) > 1:
            from editor_tpu.parallel.tp import train_state_tp_shardings
            state_shardings = train_state_tp_shardings(state, mesh)
            state = jax.tree_util.tree_map(jax.device_put, state,
                                           state_shardings)
            logger.info("TP: backbone weights Megatron-split over the model "
                        "axis (%d-way)", mesh.shape["model"])
        step = build_train_step(ecfg, opt, loss_func, lr_fn,
                                cfg.SOLVER.BASE_LR,
                                compute_dtype=compute_dtype, mesh=mesh,
                                donate=cfg.TPU.DONATE, augment=augment,
                                state_shardings=state_shardings,
                                grad_accum=cfg.TPU.GRAD_ACCUM,
                                gather_params_compute=(
                                    cfg.TPU.ZERO_STAGE == 3))

    ckpt_mgr = None
    start_epoch = 1
    if cfg.OUTPUT_DIR:
        from editor_tpu.utils.checkpoint import CheckpointManager
        ckpt_mgr = CheckpointManager(os.path.join(cfg.OUTPUT_DIR, "ckpt"),
                                     use_async=cfg.TPU.ASYNC_CHECKPOINT)
        # auto-resume: restore the full train state (the elastic supervisor
        # restarts this entry point; unlike the reference's model-only saves,
        # engine/processor.py:120-127, this resumes exactly)
        latest = ckpt_mgr.latest_step()
        if latest is not None:
            from editor_tpu.parallel.tp import permute_train_state
            restored = ckpt_mgr.restore(
                latest, template={"state": _ckpt_state(state, ecfg, tp, mesh),
                                  "epoch": 0})
            state = jax.tree_util.tree_map(jnp.asarray, restored["state"])
            if not isinstance(state, TrainState):
                state = TrainState(**state) if isinstance(state, dict) else state
            # checkpoints are canonical-layout; re-enter the TP layout
            state = permute_train_state(state, ecfg.vit.num_heads, tp)
            if state_shardings is not None:
                # re-enter the ZeRO/TP device layout (restore hands every
                # host the full replicated value, same on all processes)
                state = jax.tree_util.tree_map(jax.device_put, state,
                                               state_shardings)
            start_epoch = int(restored["epoch"]) + 1
            logger.info("Resumed from checkpoint step %d (epoch %d)",
                        latest, start_epoch - 1)

    loss_meter, acc_meter = AverageMeter(), AverageMeter()
    best = {"mAP": 0.0, "Rank-1": 0.0, "Rank-5": 0.0, "Rank-10": 0.0}
    log_period = cfg.SOLVER.LOG_PERIOD

    for epoch in range(start_epoch, cfg.SOLVER.MAX_EPOCHS + 1):
        t0 = time.time()
        loss_meter.reset()
        acc_meter.reset()
        epoch_arr = jnp.asarray(epoch)
        n_iter = 0
        for batch in dm.train_epoch(epoch, host_id=rank, num_hosts=nproc):
            if mesh is not None and nproc > 1:
                feed = shard_host_batch(mesh, batch)
            elif mesh is not None:
                feed = shard_batch(mesh, {k: jnp.asarray(v)
                                          for k, v in batch.items()})
            else:
                feed = {k: jnp.asarray(v) for k, v in batch.items()}
            state, metrics = step(state, feed, epoch_arr)
            n_iter += 1
            if n_iter % log_period == 0:
                loss = float(metrics["loss"])
                acc = float(metrics["acc"])
                loss_meter.update(loss, batch["pid"].shape[0])
                acc_meter.update(acc)
                logger.info(
                    "Epoch[%d] Iteration[%d] Loss: %.3f, Acc: %.3f, Base Lr: %.2e",
                    epoch, n_iter, loss_meter.avg, acc_meter.avg,
                    float(metrics["lr"]))
                writer.write({"epoch": epoch, "iter": n_iter, "loss": loss,
                              "acc": acc, "lr": float(metrics["lr"])})
            if max_steps_per_epoch and n_iter >= max_steps_per_epoch:
                break
        dt = time.time() - t0
        if n_iter:
            logger.info("Epoch %d done. %.1f samples/s", epoch,
                        n_iter * cfg.SOLVER.IMS_PER_BATCH / dt)

        if ckpt_mgr and epoch % cfg.SOLVER.CHECKPOINT_PERIOD == 0:
            ckpt_mgr.save(int(state.step),
                          {"state": _ckpt_state(state, ecfg, tp, mesh),
                           "epoch": epoch})

        if epoch % cfg.SOLVER.EVAL_PERIOD == 0 and dm.num_query > 0:
            cmc, mAP = evaluate(cfg, ecfg, state, dm, mesh, compute_dtype)
            logger.info("Validation Results - Epoch: %d", epoch)
            logger.info("mAP: %.2f%%", mAP * 100)
            for r in (1, 5, 10):
                if len(cmc) >= r:
                    logger.info("CMC curve, Rank-%d: %.2f%%", r, cmc[r - 1] * 100)
            writer.write({"epoch": epoch, "mAP": mAP, "rank1": float(cmc[0])})
            if mAP >= best["mAP"]:
                best = {"mAP": mAP, "Rank-1": float(cmc[0]),
                        "Rank-5": float(cmc[4]) if len(cmc) > 4 else 0.0,
                        "Rank-10": float(cmc[9]) if len(cmc) > 9 else 0.0}
                if ckpt_mgr:
                    ckpt_mgr.save(int(state.step),
                                  {"state": _ckpt_state(state, ecfg, tp, mesh),
                                   "epoch": epoch}, force=True)
            logger.info("Best mAP so far: %.2f%%", best["mAP"] * 100)

    if ckpt_mgr:
        ckpt_mgr.wait()
    return {"state": state, "best": best, "ecfg": ecfg}
