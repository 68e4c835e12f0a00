"""Torch → editor_tpu checkpoint converter CLI.

Converts a trained reference EDITOR ``.pth`` (or an ImageNet ViT ``.pth``)
into a portable ``.npz`` param/state bundle loadable without torch.

Usage:
    python tools/convert_checkpoint.py --pth EDITORbest.pth \
        --config_file configs/RGBNT201.yaml --num_classes 171 \
        --camera_num 4 --out editor_rgbnt201.npz
    python tools/convert_checkpoint.py --pth jx_vit_base_p16_224.pth \
        --backbone-only --out vit_b16.npz
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--pth", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--config_file", default="")
    parser.add_argument("--num_classes", type=int, default=171)
    parser.add_argument("--camera_num", type=int, default=4)
    parser.add_argument("--backbone-only", action="store_true",
                        help="treat the .pth as a plain ViT (ImageNet/timm)")
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    args = parser.parse_args(argv)

    import jax

    from editor_tpu.config import load_config
    from editor_tpu.models import editor_config_from, editor_init
    from editor_tpu.utils.checkpoint import save_params_npz
    from editor_tpu.utils.torch_convert import (
        convert_editor_from_torch,
        load_imagenet_vit,
    )

    cfg = load_config(args.config_file or None, args.opts or None)
    ecfg = editor_config_from(cfg, args.num_classes, args.camera_num)
    params, state = editor_init(jax.random.PRNGKey(0), ecfg)

    if args.backbone_only:
        params["BACKBONE"] = load_imagenet_vit(args.pth, ecfg.vit,
                                               params["BACKBONE"])
    else:
        params, state = convert_editor_from_torch(args.pth, ecfg, params, state)

    save_params_npz(args.out, {"params": params, "state": state})
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
