"""Training entry point (reference: train_net.py:16-89).

Usage:
    python -m editor_tpu.cli.train --config_file configs/RGBNT201.yaml \
        SOLVER.BASE_LR 0.001 MODEL.AL 1
"""

from __future__ import annotations

import argparse
import os
import random

import numpy as np


def set_seed(seed: int):
    # reference: train_net.py:16-23; device-side determinism comes from the
    # PRNG keys in the train state, this covers host-side sampling
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)


def main(argv=None):
    parser = argparse.ArgumentParser(description="editor_tpu training")
    parser.add_argument("--config_file", default="", type=str)
    parser.add_argument("opts", nargs=argparse.REMAINDER,
                        help="KEY VALUE config overrides")
    args = parser.parse_args(argv)

    if os.environ.get("EDITOR_TPU_PLATFORM"):
        # explicit platform override (e.g. multi-process CPU clusters on a
        # host whose sitecustomize pins another platform) — must land
        # before any backend use
        import jax
        jax.config.update("jax_platforms", os.environ["EDITOR_TPU_PLATFORM"])

    from editor_tpu.config import load_config
    cfg = load_config(args.config_file or None, args.opts or None)
    set_seed(cfg.SOLVER.SEED)

    # join the multi-host cluster when launched under cli.launch / torchrun
    # env (MASTER_ADDR & co.); no-op for single-process runs
    from editor_tpu.parallel import multihost
    multihost.initialize()

    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    if multihost.is_primary():
        with open(os.path.join(cfg.OUTPUT_DIR, "config.yaml"), "w") as f:
            f.write(cfg.dump())

    from editor_tpu.engine.loop import do_train
    try:
        result = do_train(cfg)
    except (SystemExit, KeyboardInterrupt) as e:
        # deliberate exits are not worker faults: no error file (the elastic
        # agent must not burn a restart on them), but a multi-process rank
        # still has to leave via the no-collective-teardown path — the
        # original exit code is preserved (130 for Ctrl+C by convention)
        if multihost.process_count() > 1:
            if isinstance(e, KeyboardInterrupt):
                code = 130
            else:
                code = e.code if isinstance(e.code, int) else (0 if e.code is None else 1)
            multihost.fail_fast(e, exit_code=code, write_error=False)
        raise
    except BaseException as e:
        # a failing rank must EXIT (nonzero) so the elastic agent sees the
        # failure — every clean-exit path is a collective handshake that
        # would deadlock against peers blocked in a train-step collective
        # (multihost.fail_fast docstring); single-process keeps the normal
        # exception flow for in-process callers and tests
        if multihost.process_count() > 1:
            multihost.fail_fast(e)
        raise
    # destroy_process_group equivalent: absorb exit skew across ranks
    multihost.shutdown()
    print("Best:", result["best"])
    return result


if __name__ == "__main__":
    main()
