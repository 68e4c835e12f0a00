"""Checkpoint export: editor_tpu → reference-layout torch .pth.

Usage:
    python -m editor_tpu.cli.export --config_file configs/RGBNT201.yaml \
        --out EDITOR.pth TEST.WEIGHT path/to/checkpoint

Writes a state_dict with the reference EDITOR's exact key names
(reference make_model.py:85-374) so the file loads into the reference torch
code via ``model.load_param`` / ``load_state_dict`` (make_model.py:144-148).
TEST.WEIGHT may be an Orbax checkpoint dir or a torch .pth (roundtrip).
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(description="editor_tpu torch export")
    parser.add_argument("--config_file", default="", type=str)
    parser.add_argument("--out", required=True, type=str,
                        help="output .pth path")
    parser.add_argument("--num_classes", default=0, type=int,
                        help="override when the dataset isn't on disk")
    parser.add_argument("--camera_num", default=0, type=int)
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    args = parser.parse_args(argv)

    import jax

    from editor_tpu.config import load_config
    cfg = load_config(args.config_file or None, args.opts or None)

    from editor_tpu.data.datasets import load_dataset
    from editor_tpu.models.editor import editor_config_from, editor_init
    from editor_tpu.utils.torch_convert import (
        convert_editor_from_torch,
        export_editor_to_torch,
    )

    # dataset only determines num_classes/cam_num; --num_classes overrides
    # when the dataset isn't on disk
    if args.num_classes:
        num_classes, cam_num = args.num_classes, args.camera_num
    else:
        splits = load_dataset(cfg.DATASETS.NAMES, cfg.DATASETS.ROOT_DIR)
        num_classes, cam_num = splits.num_train_pids, splits.num_train_cams
    ecfg = editor_config_from(cfg, num_classes, cam_num)
    params, mstate = editor_init(jax.random.PRNGKey(cfg.SOLVER.SEED), ecfg)

    weight = cfg.TEST.WEIGHT
    if weight.endswith(".pth"):
        params, mstate = convert_editor_from_torch(weight, ecfg, params,
                                                   mstate)
    elif weight:
        from editor_tpu.utils.checkpoint import restore_eval_state
        params, mstate = restore_eval_state(weight)
    else:
        raise SystemExit("TEST.WEIGHT is required (checkpoint to export)")

    sd = export_editor_to_torch(params, mstate, ecfg, args.out)
    print(f"wrote {len(sd)} tensors -> {args.out}")
    return sd


if __name__ == "__main__":
    main()
