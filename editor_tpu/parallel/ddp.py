"""Explicit data-parallel train step (shard_map) with pluggable gradient
reduction — the DDP-with-comm-hooks equivalent.

reference: DDP wrap + Reducer bucketed all-reduce
(engine/processor.py:47-50, distributed/__init__.py Reducer/GradBucket) with
comm hooks (algorithms/ddp_comm_hooks/). The default pjit step
(editor_tpu/engine/train.py) lets XLA insert the gradient all-reduce
implicitly; THIS variant makes the reduction explicit inside ``shard_map`` so
compression hooks (fp16/bf16/int8/PowerSGD — editor_tpu/parallel/compression)
can transform the communicated payload, exactly where the reference's
GradBucket hooks sit.

Semantics note: like reference DDP, each device computes the loss on its
LOCAL shard (batch-hard triplet mining within the local P×K block), then
gradients are mean-reduced. The pjit step instead mines over the global
batch; both are valid — this one reproduces the reference's multi-GPU math.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from editor_tpu.engine.train import TrainState
from editor_tpu.models.editor import EditorConfig, editor_apply
from editor_tpu.parallel.compression import Reducer, allreduce_reducer
from editor_tpu.solver.optimizer import Optimizer

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DDPState:
    train: TrainState
    comm: Any  # reducer state (e.g. PowerSGD P/Q + error feedback)


def make_ddp_state(state: TrainState, reducer: Reducer,
                   grads_template: Any) -> DDPState:
    return DDPState(train=state, comm=reducer.init(grads_template))


def build_ddp_train_step(
    ecfg: EditorConfig,
    optimizer: Optimizer,
    loss_func: Callable,
    lr_fn: Callable,
    base_lr: float,
    mesh: Mesh,
    reducer: Optional[Reducer] = None,
    compute_dtype=jnp.bfloat16,
    augment: Optional[Callable] = None,
) -> Callable:
    """Returns step(ddp_state, batch, epoch) -> (ddp_state, metrics)."""
    reducer = reducer or allreduce_reducer()

    def local_step(state: TrainState, comm, batch: Dict[str, Array], epoch):
        rng, step_rng = jax.random.split(state.rng)
        # decorrelate per-device randomness
        dev = lax.axis_index("data")
        step_rng = jax.random.fold_in(step_rng, dev)
        if augment is not None:
            aug_rng = jax.random.fold_in(step_rng, 7)
            images = {k: augment(jax.random.fold_in(aug_rng, i),
                                 batch[k]).astype(compute_dtype)
                      for i, k in enumerate(("RGB", "NI", "TI")) if k in batch}
        else:
            images = {k: batch[k].astype(compute_dtype)
                      for k in ("RGB", "NI", "TI") if k in batch}
        labels = batch["pid"]
        cams = batch.get("camid")

        def loss_of(params):
            out, new_mstate = editor_apply(
                params, state.model_state, ecfg, images, labels=labels,
                cam_ids=cams, training=True, rng=step_rng)
            total = jnp.asarray(0.0, jnp.float32)
            for score, feat in out.pairs:
                total = total + loss_func(score, feat, labels)
            total = total + out.aux_loss
            acc = jnp.mean((jnp.argmax(out.pairs[0][0], axis=1)
                            == labels).astype(jnp.float32))
            return total, (new_mstate, acc)

        (loss, (new_mstate, acc)), grads = jax.value_and_grad(
            loss_of, has_aux=True)(state.params)

        grads, new_comm = reducer.reduce(grads, comm, "data")
        # stateful cross-batch buffers must agree across replicas: average
        # OCFR center updates and BN batch stats (DDP broadcasts buffers)
        new_mstate = jax.tree_util.tree_map(
            lambda x: lax.pmean(x, "data"), new_mstate)

        lr = lr_fn(epoch, base_lr)
        new_params, new_opt = optimizer.update(grads, state.opt_state,
                                              state.params, lr)
        new_train = TrainState(params=new_params, opt_state=new_opt,
                               model_state=new_mstate, rng=rng,
                               step=state.step + 1)
        metrics = {"loss": lax.pmean(loss, "data"),
                   "acc": lax.pmean(acc, "data"), "lr": lr}
        return new_train, new_comm, metrics

    repl = P()
    data = P("data")

    def batch_spec(batch):
        return {k: data for k in batch}

    @jax.jit
    def step(ddp_state: DDPState, batch: Dict[str, Array], epoch):
        fn = shard_map(
            local_step, mesh=mesh,
            in_specs=(repl, repl, batch_spec(batch), repl),
            out_specs=(repl, repl, repl),
            check_vma=False,
        )
        new_train, new_comm, metrics = fn(ddp_state.train, ddp_state.comm,
                                          batch, epoch)
        return DDPState(train=new_train, comm=new_comm), metrics

    return step
