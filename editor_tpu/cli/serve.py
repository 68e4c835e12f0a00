"""Retrieval serving entry point (deployment surface beyond the reference's
offline eval, reference: test_net.py:9-45).

Usage:
    # index the dataset's gallery split, then serve queries over HTTP
    python -m editor_tpu.cli.serve --config_file configs/RGBNT201.yaml \
        --port 8080 TEST.WEIGHT path/to/checkpoint

    # or serve a previously saved index
    python -m editor_tpu.cli.serve --config_file configs/RGBNT201.yaml \
        --index gallery.npz --port 8080 TEST.WEIGHT …

Query with:
    curl -s localhost:8080/query -d '{"images": {"RGB": "<b64 jpeg>",
        "NI": "…", "TI": "…"}, "topk": 5}'
"""

from __future__ import annotations

import argparse


def build_service(cfg, weight: str = "", index_path: str = "",
                  batch_size: int = 32, save_index: str = ""):
    """Load weights, index the gallery split, return (server-less) parts."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from editor_tpu.data.loader import ReIDDataModule
    from editor_tpu.models.editor import editor_config_from, editor_init
    from editor_tpu.serve import FeatureExtractor, GalleryIndex

    dm = ReIDDataModule(cfg)
    ecfg = editor_config_from(cfg, dm.num_classes, dm.cam_num)
    params, mstate = editor_init(jax.random.PRNGKey(cfg.SOLVER.SEED), ecfg)
    if weight.endswith(".pth"):
        from editor_tpu.utils.torch_convert import convert_editor_from_torch
        params, mstate = convert_editor_from_torch(weight, ecfg, params,
                                                   mstate)
    elif weight:
        from editor_tpu.utils.checkpoint import restore_eval_state
        params, mstate = restore_eval_state(weight)

    extractor = FeatureExtractor(
        cfg, ecfg, params, mstate, batch_size=batch_size,
        compute_dtype=jnp.dtype(cfg.TPU.COMPUTE_DTYPE))

    if index_path:
        index = GalleryIndex.load(index_path)
        if index.feat_dim != extractor.feat_dim:
            raise ValueError(f"index dim {index.feat_dim} != model "
                             f"{extractor.feat_dim}")
        return extractor, index

    index = GalleryIndex(extractor.feat_dim,
                         feat_norm=cfg.TEST.FEAT_NORM == "yes")
    # gallery = val items after the query block (reference metrics split,
    # utils/metrics.py:263-274)
    nq = dm.num_query
    total = len(dm.val_items)
    seen = 0
    for batch in dm.val_batches():
        take = min(len(batch["pid"]), total - seen)
        idxs = np.arange(seen, seen + take)
        keep = idxs >= nq
        if keep.any():
            feats = extractor(
                {m: batch[m][:take][keep] for m in ("RGB", "NI", "TI")
                 if m in batch},
                np.asarray(batch["camid"][:take])[keep])
            # Item = (img_paths, pid, camid, trackid) tuples (data/datasets.py)
            items = [dm.val_items[i] for i in idxs[keep]]
            index.add(feats, np.asarray(batch["pid"][:take])[keep],
                      np.asarray(batch["camid"][:take])[keep],
                      [str(it[0]) for it in items])
        seen += take
    if save_index:
        index.save(save_index)
    return extractor, index


def main(argv=None):
    parser = argparse.ArgumentParser(description="editor_tpu retrieval server")
    parser.add_argument("--config_file", default="", type=str)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", default=8080, type=int)
    parser.add_argument("--batch_size", default=32, type=int,
                        help="compiled static extraction batch")
    parser.add_argument("--index", default="", type=str,
                        help="load a saved gallery .npz instead of indexing")
    parser.add_argument("--save_index", default="", type=str,
                        help="save the built gallery index to this .npz")
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    args = parser.parse_args(argv)

    from editor_tpu.config import load_config
    from editor_tpu.serve import RetrievalServer
    from editor_tpu.utils.logger import setup_logger

    cfg = load_config(args.config_file or None, args.opts or None)
    logger = setup_logger("editor_tpu.serve", cfg.OUTPUT_DIR, "serve_log.txt")
    extractor, index = build_service(cfg, cfg.TEST.WEIGHT, args.index,
                                     args.batch_size, args.save_index)
    server = RetrievalServer(extractor, index, args.host, args.port)
    logger.info("serving %d gallery entries (dim %d) on %s:%d",
                len(index), index.feat_dim, *server.address)
    server.serve_forever()


if __name__ == "__main__":
    main()
