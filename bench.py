"""Benchmark: RGBNT201 tri-modal EDITOR images/sec/chip (eval + train).

Runs the flagship ViT-B/16 EDITOR eval forward (3 modalities, SFTS + HMA,
256x128) in bf16 on the available accelerator and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N,
   "train_img_per_sec": N}

value/vs_baseline are the eval path; train_img_per_sec measures the full
jitted training step (forward + loss + backward + SGD update, block remat,
batch 128 — the reference's samples/s log, engine/processor.py:104-118).

vs_baseline is measured throughput / BASELINE_TARGET, where BASELINE_TARGET
is 5x an estimated A100 torch-eager throughput for the same model
(BASELINE.md: the reference publishes no throughput; 800 img/s is a
deliberately generous estimate for fp16 torch eager tri-modal ViT-B with 12
retained attention maps at batch 64, so the target is 4000 img/s/chip —
physically unreachable on a v5e; see BASELINE.md "speed of light").
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_EST_IMG_PER_SEC = 800.0
BASELINE_TARGET = 5.0 * A100_EST_IMG_PER_SEC


def main():
    from __graft_entry__ import _flagship_cfg
    from editor_tpu.models import editor_apply, editor_init

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    ecfg = _flagship_cfg(use_pallas=on_tpu)
    params, state = editor_init(jax.random.PRNGKey(0), ecfg)
    B = 128 if on_tpu else 2
    rng = np.random.RandomState(0)
    images = {
        m: jnp.asarray(rng.randn(B, 256, 128, 3), jnp.bfloat16)
        for m in ("RGB", "NI", "TI")
    }
    cams = jnp.zeros((B,), jnp.int32)

    @jax.jit
    def extract(params, state, images, cams):
        feat, _ = editor_apply(params, state, ecfg, images, cam_ids=cams,
                               training=False)
        return feat

    # warmup / compile (np.asarray forces a host readback — on the tunneled
    # axon platform block_until_ready returns before execution finishes)
    np.asarray(extract(params, state, images, cams))

    iters = 50 if on_tpu else 2
    t0 = time.perf_counter()
    for _ in range(iters):
        out = extract(params, state, images, cams)
    float(jnp.sum(out))  # host readback = completion barrier
    dt = time.perf_counter() - t0
    ips = B * iters / dt

    train_ips = bench_train(on_tpu)

    print(json.dumps({
        "metric": "rgbnt201_trimodal_feature_extraction",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / BASELINE_TARGET, 4),
        "train_img_per_sec": round(train_ips, 2),
    }))


def bench_train(on_tpu: bool) -> float:
    """Full train step (fwd+bwd+SGD, block remat) at the flagship batch."""
    import dataclasses

    from __graft_entry__ import _flagship_cfg
    from editor_tpu.config import Config
    from editor_tpu.engine import build_train_step, make_train_state
    from editor_tpu.losses import make_loss
    from editor_tpu.solver import make_optimizer, make_scheduler

    ecfg = _flagship_cfg(use_pallas=on_tpu)
    ecfg = dataclasses.replace(
        ecfg, vit=dataclasses.replace(ecfg.vit, remat=True,
                                      remat_policy="block"))
    cfg = Config()
    loss_func = make_loss(cfg, ecfg.num_classes)
    lr_fn = make_scheduler(cfg)
    opt_state_key = jax.random.PRNGKey(1)
    from editor_tpu.models import editor_init
    params, _ = editor_init(opt_state_key, ecfg)
    opt = make_optimizer(cfg, params)
    state = make_train_state(opt_state_key, ecfg, opt)
    step = build_train_step(ecfg, opt, loss_func, lr_fn, cfg.SOLVER.BASE_LR,
                            compute_dtype=jnp.bfloat16, donate=True)

    B = 128 if on_tpu else 2
    rng = np.random.RandomState(1)
    batch = {
        **{m: jnp.asarray(rng.randn(B, 256, 128, 3), jnp.bfloat16)
           for m in ("RGB", "NI", "TI")},
        "pid": jnp.asarray(np.arange(B) % 16),
        "camid": jnp.zeros((B,), jnp.int32),
    }
    epoch = jnp.asarray(1)
    state, metrics = step(state, batch, epoch)   # compile
    float(metrics["loss"])                       # host readback barrier

    iters = 15 if on_tpu else 2
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch, epoch)
    float(metrics["loss"])
    dt = time.perf_counter() - t0
    return B * iters / dt


if __name__ == "__main__":
    main()
