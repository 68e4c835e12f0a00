"""CPU fp32 oracle for the on-hardware full-model certification
(tests/test_tpu_full_model.py; round-4 verdict missing #1).

Run as a subprocess with a CPU platform; computes, for the FLAGSHIP
EDITOR configuration (ViT-B/16, 256x128, SFTS+HMA, COMPACT_TAIL):

  * eval features for a fixed synthetic batch (B=8), fp32, XLA path
    (use_pallas=False) — the numerics oracle the TPU bf16/Pallas composed
    graph is certified against;
  * the loss trajectory of 2 full train steps (fwd+loss+bwd+SGD, block
    remat) on a fixed batch, fp32;

and writes them to the .npz given as argv[1]. Inputs/weights are derived
from fixed PRNG seeds so the TPU process reconstructs them identically
(JAX PRNG bit-streams are backend-independent).
"""

from __future__ import annotations

import os
import sys

# run as a plain script (python tests/tpu_oracle_worker.py): the script dir
# is tests/, but __graft_entry__ and editor_tpu live at the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # ambient sitecustomize pins axon

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

EVAL_B = 8
TRAIN_B = 8
TRAIN_STEPS = 2


def eval_inputs(dtype):
    rng = np.random.RandomState(0)
    images = {m: jnp.asarray(rng.randn(EVAL_B, 256, 128, 3), dtype)
              for m in ("RGB", "NI", "TI")}
    return images, jnp.zeros((EVAL_B,), jnp.int32)


def train_batch(dtype):
    rng = np.random.RandomState(1)
    return {
        **{m: jnp.asarray(rng.randn(TRAIN_B, 256, 128, 3), dtype)
           for m in ("RGB", "NI", "TI")},
        "pid": jnp.asarray(np.arange(TRAIN_B) % 4),  # 4 ids x 2 instances
        "camid": jnp.zeros((TRAIN_B,), jnp.int32),
    }


def flagship_train_setup(use_pallas: bool):
    """Mirrors bench.py:bench_train's construction exactly (same seeds)."""
    import dataclasses

    from __graft_entry__ import _flagship_cfg
    from editor_tpu.config import Config
    from editor_tpu.engine import build_train_step, make_train_state
    from editor_tpu.losses import make_loss
    from editor_tpu.models import editor_init
    from editor_tpu.solver import make_optimizer, make_scheduler

    ecfg = _flagship_cfg(use_pallas=use_pallas)
    ecfg = dataclasses.replace(
        ecfg, vit=dataclasses.replace(ecfg.vit, remat=True,
                                      remat_policy="block"))
    cfg = Config()
    loss_func = make_loss(cfg, ecfg.num_classes)
    lr_fn = make_scheduler(cfg)
    key = jax.random.PRNGKey(1)
    params, _ = editor_init(key, ecfg)
    opt = make_optimizer(cfg, params)
    state = make_train_state(key, ecfg, opt)
    return ecfg, cfg, opt, loss_func, lr_fn, state, params


def main(out_path: str) -> None:
    from __graft_entry__ import _flagship_cfg
    from editor_tpu.engine import build_train_step
    from editor_tpu.engine.train import TrainState
    from editor_tpu.models import editor_apply, editor_init

    # ---- eval features (fp32, XLA path) --------------------------------
    ecfg = _flagship_cfg(use_pallas=False)
    params, state = editor_init(jax.random.PRNGKey(0), ecfg)
    images, cams = eval_inputs(jnp.float32)
    feat, _ = jax.jit(
        lambda p, s, im, c: editor_apply(p, s, ecfg, im, cam_ids=c,
                                         training=False))(
        params, state, images, cams)
    feat = np.asarray(feat, np.float32)

    # ---- train-step loss trajectory (fp32, remat on) -------------------
    tecfg, tcfg, opt, loss_func, lr_fn, tstate, tparams = (
        flagship_train_setup(use_pallas=False))
    tstate = TrainState(params=tparams, opt_state=opt.init(tparams),
                        model_state=tstate.model_state, rng=tstate.rng,
                        step=tstate.step)
    step = build_train_step(tecfg, opt, loss_func, lr_fn,
                            tcfg.SOLVER.BASE_LR,
                            compute_dtype=jnp.float32, donate=True)
    batch = train_batch(jnp.float32)
    epoch = jnp.asarray(1)
    losses, accs = [], []
    for _ in range(TRAIN_STEPS):
        tstate, metrics = step(tstate, batch, epoch)
        losses.append(float(metrics["loss"]))
        accs.append(float(metrics["acc"]))
    gnorm = float(jnp.sqrt(sum(
        jnp.sum(jnp.square(x.astype(jnp.float32)))
        for x in jax.tree_util.tree_leaves(tstate.params))))

    np.savez(out_path, feat=feat,
             losses=np.asarray(losses, np.float64),
             accs=np.asarray(accs, np.float64),
             param_gnorm=np.float64(gnorm))
    print("oracle written:", out_path)


if __name__ == "__main__":
    main(sys.argv[1])
