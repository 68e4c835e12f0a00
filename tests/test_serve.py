"""Serving stack: extractor padding, gallery index, HTTP retrieval service.

Deployment surface beyond the reference's offline eval (test_net.py:9-45):
fixed-batch compiled extraction, gallery search with the offline-eval
distance semantics, and the stdlib HTTP JSON API.
"""

import base64
import io
import json
import os
import os.path as osp
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from editor_tpu.config import Config
from editor_tpu.models import EditorConfig, ViTConfig, editor_init
from editor_tpu.serve import FeatureExtractor, GalleryIndex, RetrievalServer


@pytest.fixture(scope="module")
def tiny_service():
    vit = ViTConfig(img_size=(64, 32), patch_size=16, stride_size=(16, 16),
                    embed_dim=96, depth=2, num_heads=4, mlp_ratio=2.0,
                    camera=4)
    ecfg = EditorConfig(num_classes=10, vit=vit, head_keep=2,
                        frequency_keep=3, use_pallas=False)
    params, mstate = editor_init(jax.random.PRNGKey(0), ecfg)
    cfg = Config()
    cfg.INPUT.SIZE_TEST = (64, 32)
    extractor = FeatureExtractor(cfg, ecfg, params, mstate, batch_size=4,
                                 compute_dtype=jnp.float32)
    return extractor


def _imgs(n, seed=0, size=(64, 32)):
    rng = np.random.RandomState(seed)
    return {m: rng.randint(0, 255, (n, *size, 3), np.uint8)
            for m in ("RGB", "NI", "TI")}


def test_extractor_pad_and_trim(tiny_service):
    """Request sizes that straddle the static batch (4): 1, 4, 6 — padding
    must not change per-sample features."""
    ex = tiny_service
    imgs6 = _imgs(6)
    f6 = ex(imgs6)
    assert f6.shape == (6, ex.feat_dim) and np.isfinite(f6).all()
    f1 = ex({m: v[:1] for m, v in imgs6.items()})
    np.testing.assert_allclose(f1[0], f6[0], rtol=2e-5, atol=2e-5)
    f4 = ex({m: v[:4] for m, v in imgs6.items()})
    np.testing.assert_allclose(f4, f6[:4], rtol=2e-5, atol=2e-5)
    f0 = ex({m: v[:0] for m, v in imgs6.items()})  # empty batch: [0, D]
    assert f0.shape == (0, ex.feat_dim)


def test_gallery_index_roundtrip_and_search(tmp_path, tiny_service):
    ex = tiny_service
    imgs = _imgs(8, seed=1)
    feats = ex(imgs, np.arange(8) % 4)
    idx = GalleryIndex(ex.feat_dim, feat_norm=True)
    idx.add(feats, pids=list(range(8)), camids=[0] * 8,
            paths=[f"g{i}.jpg" for i in range(8)])
    # self-query: top-1 must be the sample itself at ~zero distance
    res = idx.search(feats, topk=3)
    assert len(res) == 8
    for qi, matches in enumerate(res):
        assert matches[0]["pid"] == qi and matches[0]["dist"] < 1e-5
        assert matches[0]["path"] == f"g{qi}.jpg"
        assert matches[0]["dist"] <= matches[1]["dist"] <= matches[2]["dist"]
    # npz persistence
    p = str(tmp_path / "gal.npz")
    idx.save(p)
    idx2 = GalleryIndex.load(p)
    assert len(idx2) == 8
    res2 = idx2.search(feats[:2], topk=1)
    assert [m[0]["pid"] for m in res2] == [0, 1]
    # re-ranked search returns the same self-match
    rr = idx.search(feats[:2], topk=2, reranking=True)
    assert rr[0][0]["pid"] == 0 and rr[1][0]["pid"] == 1


def _b64(arr):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")  # lossless for exactness
    return base64.b64encode(buf.getvalue()).decode()


def _post(addr, path, payload):
    req = urllib.request.Request(
        f"http://{addr[0]}:{addr[1]}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=30) as r:
        return json.loads(r.read())


def test_http_service_end_to_end(tiny_service):
    ex = tiny_service
    imgs = _imgs(6, seed=2)
    feats = ex(imgs, np.zeros(6, np.int32))
    idx = GalleryIndex(ex.feat_dim)
    idx.add(feats, pids=[10 + i for i in range(6)], camids=[0] * 6)

    server = RetrievalServer(ex, idx, port=0)  # OS-assigned port
    server.start()
    try:
        addr = server.address
        with urllib.request.urlopen(
                f"http://{addr[0]}:{addr[1]}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok" and health["gallery_size"] == 6

        # query with gallery image #3 → top-1 pid 13 at ~0 distance
        q = {m: _b64(v[3]) for m, v in imgs.items()}
        out = _post(addr, "/query", {"images": q, "topk": 2})
        assert out["matches"][0]["pid"] == 13
        assert out["matches"][0]["dist"] < 1e-4

        # 2-modal request falls back NI/TI→RGB without erroring
        out2 = _post(addr, "/query", {"images": {"RGB": q["RGB"]},
                                      "topk": 1})
        assert len(out2["matches"]) == 1

        # add a new gallery entry, then retrieve it
        out3 = _post(addr, "/gallery/add",
                     {"images": q, "pid": 99, "path": "new.jpg"})
        assert out3["gallery_size"] == 7
        out4 = _post(addr, "/query", {"images": q, "topk": 1})
        assert out4["matches"][0]["pid"] in (13, 99)  # both ~zero distance

        # malformed request → structured 400, server stays alive
        try:
            _post(addr, "/query", {"images": {}})
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "error" in json.loads(e.read())
        assert _post(addr, "/query", {"images": q, "topk": 1})["matches"]
    finally:
        server.shutdown()


@pytest.mark.slow
def test_build_service_from_dataset(tmp_path):
    """cli/serve.build_service indexes the dataset gallery split (entries
    after num_query) and a saved index reloads with identical search
    results."""
    root = str(tmp_path / "data")
    base = osp.join(root, "RGBNT201")
    protos = {pid: np.random.RandomState(50 + pid).randint(
        0, 255, (64, 32, 3)) for pid in range(3)}
    for split, n in (("train_171", 6), ("test", 9)):
        for i in range(n):
            pid, cam = i % 3, (i // 3) % 2 + 1
            name = f"{pid:06d}_cam{cam}_{split}{i}.jpg"
            img = np.clip(protos[pid] + np.random.RandomState(i).randint(
                -10, 10, (64, 32, 3)), 0, 255).astype(np.uint8)
            for mod in ("RGB", "NI", "TI"):
                p = osp.join(base, split, mod, name)
                os.makedirs(osp.dirname(p), exist_ok=True)
                Image.fromarray(img).save(p)

    from editor_tpu.cli.serve import build_service
    cfg = Config()
    cfg.DATASETS.ROOT_DIR = root
    cfg.INPUT.SIZE_TRAIN = (64, 32)  # the model grid follows SIZE_TRAIN
    cfg.INPUT.SIZE_TEST = (64, 32)
    cfg.TEST.IMS_PER_BATCH = 4
    cfg.TPU.COMPUTE_DTYPE = "float32"
    idx_path = str(tmp_path / "gal.npz")
    extractor, index = build_service(cfg, batch_size=4,
                                     save_index=idx_path)
    from editor_tpu.data.loader import ReIDDataModule
    dm = ReIDDataModule(cfg)
    assert len(index) == len(dm.val_items) - dm.num_query
    assert index.feat_dim == extractor.feat_dim

    # reload from npz (the --index path) and cross-check a search
    _, index2 = build_service(cfg, index_path=idx_path, batch_size=4)
    q = _imgs(1, seed=9)
    f = extractor(q)
    r1, r2 = index.search(f, topk=3), index2.search(f, topk=3)
    assert [m["pid"] for m in r1[0]] == [m["pid"] for m in r2[0]]
