"""Observability parity: MSVR310 rank lists, TB metric mirror, viz dumps."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def test_write_rank_list(tmp_path):
    from editor_tpu.evals.metrics import write_rank_list

    rng = np.random.RandomState(0)
    Q, G = 3, 10
    distmat = rng.rand(Q, G)
    q_pids = np.array([1, 2, 3])
    g_pids = np.array([1, 2, 3, 1, 2, 3, 4, 5, 6, 7])
    q_cams = np.array([0, 1, 2])
    g_cams = np.arange(G) % 3
    q_scenes = np.array([10, 11, 12])
    g_scenes = np.array([10, 11, 12, 20, 21, 22, 23, 24, 25, 26])
    path = str(tmp_path / "re.txt")
    write_rank_list(path, distmat, q_pids, g_pids, q_cams, g_cams,
                    q_scenes, g_scenes, max_rank=5)
    lines = open(path).read().splitlines()
    assert lines[0] == "rank list file"
    # one header + one rank line per query
    assert len(lines) == 1 + 2 * Q
    assert lines[1] == "1_s10_v0:"
    # same-(pid, scene) gallery entries are filtered out of query 0's list
    assert "1_s10_" not in lines[2]
    assert len(lines[2].split()) == 5


def test_evaluator_writes_rank_list(tmp_path):
    from editor_tpu.evals.metrics import R1mAPEvaluator

    rng = np.random.RandomState(1)
    path = str(tmp_path / "re.txt")
    ev = R1mAPEvaluator(num_query=4, msvr_protocol=True, rank_list_path=path)
    feats = rng.randn(12, 8).astype(np.float32)
    pids = np.array([0, 1, 2, 3] + [0, 1, 2, 3, 0, 1, 2, 3])
    cams = np.arange(12) % 3
    scenes = np.array([5, 6, 7, 8] + [9] * 8)
    ev.update(feats, pids, cams, scenes)
    cmc, mAP, *_ = ev.compute()
    assert os.path.exists(path)
    assert open(path).readline().strip() == "rank list file"
    assert 0.0 <= mAP <= 1.0


def test_metric_writer_tensorboard(tmp_path):
    from editor_tpu.utils.logger import MetricWriter

    w = MetricWriter(str(tmp_path), tensorboard=True)
    w.write({"step": 1, "loss": 0.5, "acc": 0.9})
    w.write({"step": 2, "loss": 0.4, "acc": 0.95})
    w.close()
    # JSONL always written
    recs = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert len(recs) == 2 and recs[1]["loss"] == 0.4
    # TB events if tensorboard importable
    if w.tb is not None:
        tb_dir = tmp_path / "tb"
        assert any(f.startswith("events") for f in os.listdir(tb_dir))


def test_visualization_dumps(tmp_path):
    from editor_tpu.models import EditorConfig, ViTConfig, editor_init
    from editor_tpu.utils.visualize import dump_eval_visualizations

    vit = ViTConfig(img_size=(64, 32), patch_size=16, stride_size=(16, 16),
                    embed_dim=96, depth=2, num_heads=4, mlp_ratio=2.0,
                    camera=4)
    ecfg = EditorConfig(num_classes=5, vit=vit, head_keep=2,
                        frequency_keep=3, use_pallas=False)
    params, state = editor_init(jax.random.PRNGKey(0), ecfg)
    rng = np.random.RandomState(0)
    images = {m: rng.randn(2, 64, 32, 3).astype(np.float32)
              for m in ("RGB", "NI", "TI")}
    out = str(tmp_path / "viz")
    paths = dump_eval_visualizations(out, params, state, ecfg, images,
                                     cam_ids=np.zeros(2, np.int32))
    names = {os.path.basename(p) for p in paths}
    # rollout + mask per modality per image, frequency per image
    assert "rollout_RGB_0.png" in names
    assert "mask_TI_1.png" in names
    assert "frequency_0.png" in names
    assert len(names) == 3 * 2 * 2 + 2
    from PIL import Image
    img = Image.open(os.path.join(out, "rollout_RGB_0.png"))
    assert img.size == (32, 64)
