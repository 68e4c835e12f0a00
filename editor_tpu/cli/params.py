"""Parameter counter (reference: params.py:65-68 — expects ~118.55 M for the
flagship EDITOR with num_class=50, camera_num=8)."""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(description="editor_tpu param count")
    parser.add_argument("--config_file", default="", type=str)
    parser.add_argument("--num_classes", default=50, type=int)
    parser.add_argument("--camera_num", default=8, type=int)
    parser.add_argument("--cnn", default="", type=str,
                        help="count a CNN-zoo model instead (the reference's "
                             "commented zoo loop, params.py:72-79); 'all' "
                             "prints every factory entry")
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    args = parser.parse_args(argv)

    import jax

    from editor_tpu.config import load_config
    from editor_tpu.models import count_params, editor_config_from, editor_init

    if args.cnn:
        from editor_tpu.models.zoo import MODEL_FACTORY, model_param_count
        names = sorted(MODEL_FACTORY) if args.cnn == "all" else [args.cnn]
        total = 0
        for name in names:
            n = model_param_count(name, num_classes=args.num_classes)
            print(f"{name}: {n / 1e6:.3f} M")
            total = n
        return total

    cfg = load_config(args.config_file or None, args.opts or None)
    ecfg = editor_config_from(cfg, args.num_classes, args.camera_num)
    params, _ = editor_init(jax.random.PRNGKey(0), ecfg)
    n = count_params(params)
    print(f"Number of parameters: {n / 1e6:.2f} M")
    return n


if __name__ == "__main__":
    main()
