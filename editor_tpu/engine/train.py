"""Training engine: TrainState + jit/pjit-compiled train step.

reference: engine/processor.py:23-214 (``do_train``). TPU-first differences:
  * The whole step — forward, output-tuple loss protocol (processor.py:83-92),
    backward, optimizer — is ONE jitted function; no per-iter host sync.
  * AMP GradScaler (processor.py:60,79) is unnecessary: bf16 compute has the
    fp32 exponent range, so there is no loss-scaling.
  * DDP wrap (processor.py:47-50) becomes a ('data','model') mesh: batch
    sharded over 'data', params replicated → XLA inserts the gradient
    all-reduce over ICI. OCFR center updates and BN batch stats are psum'd
    across the data axis implicitly by the same mechanism (segment sums are
    linear in the batch).
  * State (params, momentum, OCFR centers, BN stats, PRNG, step) is one
    pytree — checkpointable and donatable.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from editor_tpu.models.editor import EditorConfig, editor_apply, editor_init
from editor_tpu.solver.optimizer import Optimizer

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: dict
    opt_state: Any
    model_state: dict  # {'ocfr': ..., 'bn': ...}
    rng: Array
    step: Array  # global step counter


def make_train_state(key: Array, ecfg: EditorConfig,
                     optimizer: Optimizer) -> TrainState:
    params, model_state = editor_init(key, ecfg)
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        model_state=model_state,
        rng=jax.random.fold_in(key, 1),
        step=jnp.zeros((), jnp.int32),
    )


def build_train_step(
    ecfg: EditorConfig,
    optimizer: Optimizer,
    loss_func: Callable,
    lr_fn: Callable,
    base_lr: float,
    compute_dtype=jnp.bfloat16,
    mesh: Optional[Mesh] = None,
    donate: bool = True,
    augment: Optional[Callable] = None,
    state_shardings: Optional[Any] = None,
    grad_accum: int = 1,
    backbone: Optional[Callable] = None,
    gather_params_compute: bool = False,
) -> Callable:
    """Returns step(state, batch, epoch) -> (state, metrics).

    ``backbone``: optional backbone replacement threaded to ``editor_apply``
    — pass ``parallel.pipeline_vit.make_pipeline_backbone(mesh, M)`` with a
    'stage' mesh to train the real EDITOR through pipeline parallelism (the
    batch is then replicated across stages unless the mesh also has a 'data'
    axis, in which case dp x pp composes).

    batch: {'RGB','NI','TI': [B,H,W,3] f32 or uint8, 'pid': [B], 'camid': [B]}.
    epoch: 1-based (traced) — feeds the epoch-stepped cosine schedule
    (reference: processor.py:68). When ``augment`` is given (see
    data/transforms.make_train_augment) it runs INSIDE the jitted step with a
    distinct PRNG key per modality (independent per-modality augmentation,
    reference bases.py:89-107).

    ``gather_params_compute`` (set for FSDP/ZeRO-3): all-gather the params
    once at the top of the step and run the model on the gathered copies.
    Storage stays sharded (``state_shardings``); without the explicit gather
    GSPMD propagates the per-leaf storage shardings (e.g. a channel-dim
    split of the patchify kernel) into the activations, where they collide
    with the batch-dim sharding inside the scan carries and force an
    involuntary full rematerialization. Gradients are constrained back to
    the storage shardings, which XLA's collective optimizer turns into the
    ZeRO reduce-scatter.

    ``grad_accum > 1`` splits the batch into that many microbatches inside
    the jitted step (lax.scan), summing gradients and stepping the optimizer
    once — the standard way to reach the reference's batch 128 (>24 GB on
    GPU, README.md:88-90) on a small-HBM chip. Semantics match torch
    accumulation: BN stats / OCFR centers advance per microbatch in order,
    batch-hard triplet mining sees each microbatch (not the effective
    batch) — so keep P×K structure within every microbatch (B, and P, must
    be divisible by grad_accum).
    """

    tp_mesh = (mesh if mesh is not None
               and mesh.shape.get("model", 1) > 1 else None)

    def step_fn(state: TrainState, batch: Dict[str, Array], epoch: Array):
        rng, step_rng = jax.random.split(state.rng)
        if augment is not None:
            aug_rng = jax.random.fold_in(state.rng, 7)
            images = {}
            for i, k in enumerate(("RGB", "NI", "TI")):
                if k in batch:
                    images[k] = augment(jax.random.fold_in(aug_rng, i),
                                        batch[k]).astype(compute_dtype)
        else:
            images = {k: batch[k].astype(compute_dtype)
                      for k in ("RGB", "NI", "TI") if k in batch}
        labels = batch["pid"]
        cams = batch.get("camid")

        # compute-side copy of the params (FSDP: one explicit all-gather)
        params_c = state.params
        if gather_params_compute and mesh is not None:
            params_c = jax.lax.with_sharding_constraint(
                state.params, NamedSharding(mesh, P()))
        # final grads pinned to the STORAGE shardings so the optimizer
        # update runs sharded (the ZeRO reduce-scatter). This must happen
        # ONCE, outside the microbatch loop: pinning the per-microbatch
        # grads (or the accumulator carry) back-propagates the weight
        # storage shardings into the cotangent activation stream inside
        # the depth scan, where they collide with the batch sharding and
        # force an involuntary full rematerialization ([SPMD] warning).
        constrain = (
            (lambda t: jax.lax.with_sharding_constraint(
                t, state_shardings.params))
            if state_shardings is not None else (lambda t: t))

        def loss_of(params, mstate, imgs, lbls, cms, rng):
            out, new_mstate = editor_apply(
                params, mstate, ecfg, imgs, labels=lbls,
                cam_ids=cms, training=True, rng=rng, tp_mesh=tp_mesh,
                backbone=backbone)
            # output-tuple protocol (processor.py:83-92): every (score, feat)
            # pair through loss_func, plus the trailing aux loss
            total = jnp.asarray(0.0, jnp.float32)
            for score, feat in out.pairs:
                total = total + loss_func(score, feat, lbls)
            total = total + out.aux_loss
            acc = jnp.mean((jnp.argmax(out.pairs[0][0], axis=1)
                            == lbls).astype(jnp.float32))
            return total, (new_mstate, acc)

        if grad_accum > 1:
            if labels.shape[0] % grad_accum:
                raise ValueError(
                    f"batch size {labels.shape[0]} is not divisible by "
                    f"grad_accum={grad_accum}")
            split = lambda x: x.reshape(
                (grad_accum, x.shape[0] // grad_accum) + x.shape[1:])
            xs = ({k: split(v) for k, v in images.items()}, split(labels),
                  None if cams is None else split(cams),
                  jax.random.split(step_rng, grad_accum))

            def body(carry, x):
                mstate, gsum, lsum, asum = carry
                imgs_i, lbls_i, cms_i, rng_i = x
                (l, (mstate, a)), g = jax.value_and_grad(
                    loss_of, has_aux=True)(params_c, mstate, imgs_i,
                                           lbls_i, cms_i, rng_i)
                gsum = jax.tree_util.tree_map(jnp.add, gsum, g)
                # accumulate loss/acc metrics at the carry dtype (f32) — under
                # x64 golden runs the per-microbatch loss is f64 and a raw add
                # would change the scan carry type
                return (mstate, gsum, lsum + l.astype(lsum.dtype),
                        asum + a.astype(asum.dtype)), None

            gzero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            zero = jnp.zeros((), jnp.float32)
            (new_mstate, gsum, lsum, asum), _ = jax.lax.scan(
                body, (state.model_state, gzero, zero, zero), xs)
            inv = 1.0 / grad_accum
            grads = constrain(
                jax.tree_util.tree_map(lambda g: g * inv, gsum))
            loss, acc = lsum * inv, asum * inv
        else:
            (loss, (new_mstate, acc)), grads = jax.value_and_grad(
                loss_of, has_aux=True)(params_c, state.model_state,
                                       images, labels, cams, step_rng)
            grads = constrain(grads)
        lr = lr_fn(epoch, base_lr)
        new_params, new_opt = optimizer.update(grads, state.opt_state,
                                              state.params, lr)
        new_state = TrainState(params=new_params, opt_state=new_opt,
                               model_state=new_mstate, rng=rng,
                               step=state.step + 1)
        metrics = {"loss": loss, "acc": acc, "lr": lr}
        return new_state, metrics

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        # pipeline-only ('stage',) meshes have no 'data' axis: the batch is
        # replicated and the pipeline shard_map owns all device placement
        data = NamedSharding(
            mesh, P("data") if "data" in mesh.axis_names else P())
        if state_shardings is None:
            state_in = repl
        else:
            state_in = state_shardings
        return jax.jit(
            step_fn,
            in_shardings=(state_in, data, repl),
            out_shardings=(state_in, repl),
            donate_argnums=(0,) if donate else (),
        )
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def fsdp_state_shardings(state: TrainState, mesh: Mesh) -> TrainState:
    """TrainState sharding pytree with FSDP/ZeRO-3 partitioning: params AND
    optimizer state sharded over the 'data' axis (model-state/rng/step
    replicated). XLA inserts the per-layer all-gather (forward/backward) and
    gradient reduce-scatter that torch FSDP hand-schedules. Pass as
    build_train_step's ``state_shardings`` and device_put the initial state
    with it (parallel/fsdp.py has the rationale)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from editor_tpu.parallel.fsdp import fsdp_shardings

    repl = NamedSharding(mesh, P())
    repl_of = lambda tree: jax.tree_util.tree_map(lambda _: repl, tree)
    return TrainState(
        params=fsdp_shardings(state.params, mesh),
        opt_state=fsdp_shardings(state.opt_state, mesh),
        model_state=repl_of(state.model_state),
        rng=repl,
        step=repl,
    )


def zero1_state_shardings(state: TrainState, mesh: Mesh) -> TrainState:
    """TrainState sharding pytree with ZeRO-1 partitioned optimizer state
    (params/model-state replicated). Pass as build_train_step's
    ``state_shardings`` and device_put the initial state with it."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from editor_tpu.parallel.zero import zero1_shardings

    repl = NamedSharding(mesh, P())
    repl_of = lambda tree: jax.tree_util.tree_map(lambda _: repl, tree)
    return TrainState(
        params=repl_of(state.params),
        opt_state=zero1_shardings(state.opt_state, mesh),
        model_state=repl_of(state.model_state),
        rng=repl,
        step=repl,
    )
