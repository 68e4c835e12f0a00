"""Evaluation entry point (reference: test_net.py:9-45).

Usage:
    python -m editor_tpu.cli.test --config_file configs/RGBNT201.yaml \
        TEST.WEIGHT path/to/checkpoint
TEST.WEIGHT may be a torch .pth (converted on the fly), an Orbax checkpoint
dir, or empty (random weights — smoke mode).
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(description="editor_tpu eval")
    parser.add_argument("--config_file", default="", type=str)
    parser.add_argument("--fea_cft", default=0, type=int,
                        help="feature config (reference test_net.py:16,22)")
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from editor_tpu.config import load_config
    cfg = load_config(args.config_file or None, args.opts or None)

    from editor_tpu.data.loader import ReIDDataModule
    from editor_tpu.engine.loop import evaluate
    from editor_tpu.engine.train import TrainState
    from editor_tpu.models.editor import editor_config_from, editor_init
    from editor_tpu.utils.logger import setup_logger

    logger = setup_logger("editor_tpu.test", cfg.OUTPUT_DIR, "test_log.txt")
    dm = ReIDDataModule(cfg)
    ecfg = editor_config_from(cfg, dm.num_classes, dm.cam_num)
    params, mstate = editor_init(jax.random.PRNGKey(cfg.SOLVER.SEED), ecfg)

    weight = cfg.TEST.WEIGHT
    if weight.endswith(".pth"):
        from editor_tpu.utils.torch_convert import convert_editor_from_torch
        params, mstate = convert_editor_from_torch(weight, ecfg, params, mstate)
        logger.info("Loaded torch checkpoint %s", weight)
    elif weight:
        from editor_tpu.utils.checkpoint import restore_eval_state
        params, mstate = restore_eval_state(weight)
        logger.info("Loaded checkpoint %s", weight)

    state = TrainState(params=params, opt_state=None, model_state=mstate,
                       rng=jax.random.PRNGKey(0), step=jnp.zeros((), jnp.int32))
    cmc, mAP = evaluate(cfg, ecfg, state, dm,
                        compute_dtype=jnp.dtype(cfg.TPU.COMPUTE_DTYPE))
    logger.info("Validation Results")
    logger.info("mAP: %.2f%%", mAP * 100)
    for r in (1, 5, 10):
        if len(cmc) >= r:
            logger.info("CMC curve, Rank-%d: %.2f%%", r, cmc[r - 1] * 100)
    return cmc, mAP


if __name__ == "__main__":
    main()
