"""Qualitative visualization entry point.

Writes the reference's optional qualitative artifacts (mask overlays
SFTS.py:65-137, attention-rollout heat maps vit_pytorch.py:575-617,
frequency reconstructions Frequency.py:20-39) as PNGs under
OUTPUT_DIR/visualizations for the first eval batch.

Usage:
    python -m editor_tpu.cli.visualize --config_file configs/RGBNT201.yaml \
        TEST.WEIGHT path/to/checkpoint [--num_images 8]
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description="editor_tpu visualize")
    parser.add_argument("--config_file", default="", type=str)
    parser.add_argument("--num_images", default=8, type=int)
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from editor_tpu.config import load_config
    cfg = load_config(args.config_file or None, args.opts or None)

    from editor_tpu.data.loader import ReIDDataModule
    from editor_tpu.data.transforms import make_eval_transform
    from editor_tpu.models.editor import editor_config_from, editor_init
    from editor_tpu.utils.logger import setup_logger
    from editor_tpu.utils.visualize import dump_eval_visualizations

    logger = setup_logger("editor_tpu.visualize", cfg.OUTPUT_DIR,
                          "visualize_log.txt")
    dm = ReIDDataModule(cfg)
    ecfg = editor_config_from(cfg, dm.num_classes, dm.cam_num)
    params, mstate = editor_init(jax.random.PRNGKey(cfg.SOLVER.SEED), ecfg)

    weight = cfg.TEST.WEIGHT
    if weight.endswith(".pth"):
        from editor_tpu.utils.torch_convert import convert_editor_from_torch
        params, mstate = convert_editor_from_torch(weight, ecfg, params,
                                                   mstate)
    elif weight:
        from editor_tpu.utils.checkpoint import CheckpointManager
        restored = CheckpointManager(weight, use_async=False).restore()
        params, mstate = restored["params"], restored["model_state"]

    transform = make_eval_transform(cfg.INPUT)
    batch = next(iter(dm.val_batches()))
    n = min(args.num_images, len(batch["pid"]))
    images = {k: np.asarray(transform(jnp.asarray(batch[k][:n])))
              for k in ("RGB", "NI", "TI") if k in batch}
    out_dir = os.path.join(cfg.OUTPUT_DIR, "visualizations")
    paths = dump_eval_visualizations(
        out_dir, params, mstate, ecfg, images,
        cam_ids=np.asarray(batch["camid"][:n]))
    logger.info("Wrote %d visualization artifacts to %s", len(paths), out_dir)
    return paths


if __name__ == "__main__":
    main()
