"""Benchmark: RGBNT201 tri-modal EDITOR feature extraction images/sec/chip.

Runs the flagship ViT-B/16 EDITOR eval forward (3 modalities, SFTS + HMA,
256x128) in bf16 on the available accelerator and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

vs_baseline is measured throughput / BASELINE_TARGET, where BASELINE_TARGET
is 5x an estimated A100 torch-eager throughput for the same model
(BASELINE.md: the reference publishes no throughput; 800 img/s is a
deliberately generous estimate for fp16 torch eager tri-modal ViT-B with 12
retained attention maps at batch 64, so the target is 4000 img/s/chip).
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

    iters = 20 if on_tpu else 2
    t0 = time.perf_counter()
    for _ in range(iters):
        out = extract(params, state, images, cams)
    float(jnp.sum(out))  # host readback = completion barrier
    dt = time.perf_counter() - t0
    ips = B * iters / dt

    print(json.dumps({
        "metric": "rgbnt201_trimodal_feature_extraction",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / BASELINE_TARGET, 4),
    }))


if __name__ == "__main__":
    main()
