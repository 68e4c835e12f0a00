"""Per-stage throughput profile of the flagship eval path on the live chip.

Usage: python tools/bench_stages.py [B]

Timing uses a host readback as the completion barrier (block_until_ready
does not block on the tunneled platform — see utils/profiling.py).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=30, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    # pre-compile the readback barrier too (first jnp.sum costs ~400ms on the
    # tunneled platform and would otherwise pollute the measurement)
    leaves = jax.tree_util.tree_leaves(out)
    float(jnp.sum(leaves[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaves = jax.tree_util.tree_leaves(out)
    float(jnp.sum(leaves[0]))  # readback barrier
    return (time.perf_counter() - t0) / iters * 1000.0  # ms


def main():
    from __graft_entry__ import _flagship_cfg
    from editor_tpu.models import editor_apply, editor_init
    from editor_tpu.models import vit as vit_mod
    from editor_tpu.models.frequency import frequency_token_select
    from editor_tpu.models.fusion import blockmask_apply
    from editor_tpu.models.sfts import sfts_select

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    on_tpu = jax.default_backend() == "tpu"
    ecfg = _flagship_cfg(use_pallas=on_tpu)
    params, state = editor_init(jax.random.PRNGKey(0), ecfg)
    rng = np.random.RandomState(0)
    images = {m: jnp.asarray(rng.randn(B, 256, 128, 3), jnp.bfloat16)
              for m in ("RGB", "NI", "TI")}
    cams = jnp.zeros((B,), jnp.int32)
    big = jnp.concatenate([images[m] for m in ("RGB", "NI", "TI")], axis=0)
    bcams = jnp.concatenate([cams] * 3, axis=0)

    full = jax.jit(lambda p, s, im, c: editor_apply(
        p, s, ecfg, im, cam_ids=c, training=False)[0])
    bb_only = jax.jit(lambda p, x, c: vit_mod.vit_apply(
        p["BACKBONE"], x, ecfg.vit, camera_id=c, training=False,
        collect_rollout=False)[0])
    bb_roll = jax.jit(lambda p, x, c: vit_mod.vit_apply(
        p["BACKBONE"], x, ecfg.vit, camera_id=c, training=False))
    freq = jax.jit(lambda im: frequency_token_select(
        [im[m] for m in ("RGB", "NI", "TI")], keep=ecfg.frequency_keep,
        stride=ecfg.vit.stride_size[0], window=ecfg.vit.patch_size))

    t_full = timeit(full, params, state, images, cams)
    t_bb = timeit(bb_only, params, big, bcams)
    t_bbr = timeit(bb_roll, params, big, bcams)
    t_freq = timeit(freq, images)

    # downstream (sfts + fusion + pool + reduce) measured as full - parts
    toks, rolls = jax.jit(lambda p, x, c: vit_mod.vit_apply(
        p["BACKBONE"], x, ecfg.vit, camera_id=c, training=False))(
            params, big, bcams)
    toks3 = [toks[i * B:(i + 1) * B] for i in range(3)]
    rolls3 = [rolls[i * B:(i + 1) * B] for i in range(3)]
    mf = freq(images)

    from editor_tpu.models.editor import _compact_selected, _tail_keep_count

    def tail(p, s, toks3, rolls3, mf):
        masked, index, _ = sfts_select(toks3, rolls3, mf,
                                       ecfg.head_keep, False)
        if ecfg.compact_tail:
            keep = _tail_keep_count(ecfg, 3)
            if keep < ecfg.num_patches:
                masked, index = _compact_selected(list(masked), index, keep)
        fused, _, _, _ = blockmask_apply(
            p["FUSE_block"], list(masked), index, s["ocfr"], None,
            num_heads=12, ocfr_momentum=0.8, training=False,
            use_pallas=ecfg.use_pallas)
        return fused
    t_tail = timeit(jax.jit(tail), params, state, toks3, rolls3, mf)

    ips = B / (t_full / 1000.0)
    print(f"B={B} backend={jax.default_backend()}")
    print(f"full eval        : {t_full:8.2f} ms  ({ips:7.1f} img/s)")
    print(f"backbone (no roll): {t_bb:8.2f} ms")
    print(f"backbone + rollout: {t_bbr:8.2f} ms  (rollout {t_bbr - t_bb:.2f})")
    print(f"frequency         : {t_freq:8.2f} ms")
    print(f"sfts+fusion tail  : {t_tail:8.2f} ms")
    print(f"unaccounted       : {t_full - t_bbr - t_freq - t_tail:8.2f} ms")


if __name__ == "__main__":
    main()
