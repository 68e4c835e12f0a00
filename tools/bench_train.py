"""Train-step sweep: remat_skip_last (HBM-for-speed) at the flagship batch.

Usage: python tools/bench_train.py [skip values...]
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from __graft_entry__ import _flagship_cfg
    from editor_tpu.config import Config
    from editor_tpu.engine import build_train_step, make_train_state
    from editor_tpu.losses import make_loss
    from editor_tpu.models import editor_init
    from editor_tpu.solver import make_optimizer, make_scheduler

    skips = [int(a) for a in sys.argv[1:]] or [0, 1, 2, 3]
    B = 128
    rng = np.random.RandomState(1)
    batch = {
        **{m: jnp.asarray(rng.randn(B, 256, 128, 3), jnp.bfloat16)
           for m in ("RGB", "NI", "TI")},
        "pid": jnp.asarray(np.arange(B) % 16),
        "camid": jnp.zeros((B,), jnp.int32),
    }
    epoch = jnp.asarray(1)
    cfg = Config()

    for skip in skips:
        try:
            ecfg = _flagship_cfg(use_pallas=True)
            ecfg = dataclasses.replace(
                ecfg, vit=dataclasses.replace(
                    ecfg.vit, remat=True, remat_policy="block",
                    remat_skip_last=skip))
            loss_func = make_loss(cfg, ecfg.num_classes)
            lr_fn = make_scheduler(cfg)
            params, _ = editor_init(jax.random.PRNGKey(1), ecfg)
            opt = make_optimizer(cfg, params)
            state = make_train_state(jax.random.PRNGKey(1), ecfg, opt)
            step = build_train_step(ecfg, opt, loss_func, lr_fn,
                                    cfg.SOLVER.BASE_LR,
                                    compute_dtype=jnp.bfloat16, donate=True)
            state, metrics = step(state, batch, epoch)
            float(metrics["loss"])
            iters = 10
            t0 = time.perf_counter()
            for _ in range(iters):
                state, metrics = step(state, batch, epoch)
            float(metrics["loss"])
            dt = (time.perf_counter() - t0) / iters
            print(f"skip_last={skip}: {dt * 1000:7.2f} ms/step "
                  f"({B / dt:7.1f} img/s)", flush=True)
            del state, step
        except Exception as e:
            print(f"skip_last={skip}: FAIL {type(e).__name__}: "
                  f"{str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
