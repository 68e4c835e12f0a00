import os
import os.path as osp

import numpy as np
import pytest
from PIL import Image


def _save(path, w=32, h=64, seed=0):
    os.makedirs(osp.dirname(path), exist_ok=True)
    rng = np.random.RandomState(seed)
    Image.fromarray(rng.randint(0, 255, (h, w, 3), dtype=np.uint8)).save(path)


@pytest.fixture(scope="module")
def tiny_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("clidata"))
    base = osp.join(root, "RGBNT201")
    # structured per-identity content so retrieval is learnable
    protos = {pid: np.random.RandomState(100 + pid).randint(0, 255, (64, 32, 3))
              for pid in range(4)}
    idx = 0
    for split, n in (("train_171", 16), ("test", 8)):
        for i in range(n):
            pid, cam = i % 4, (i // 4) % 2 + 1  # each pid seen from 2 cameras
            name = f"{pid:06d}_cam{cam}_{idx}.jpg"
            noisy = np.clip(protos[pid] + np.random.RandomState(idx).randint(
                -20, 20, (64, 32, 3)), 0, 255).astype(np.uint8)
            for mod in ("RGB", "NI", "TI"):
                p = osp.join(base, split, mod, name)
                os.makedirs(osp.dirname(p), exist_ok=True)
                Image.fromarray(noisy).save(p)
            idx += 1
    return root


@pytest.mark.slow
def test_cli_train_end_to_end(tiny_root, tmp_path):
    from editor_tpu.cli.train import main
    out = str(tmp_path / "out")
    result = main([
        "MODEL.TRANSFORMER_TYPE", "vit_tiny_test",
        "MODEL.PRETRAIN_CHOICE", "random",
        "MODEL.DROP_PATH", "0.0",
        "INPUT.SIZE_TRAIN", "[64, 32]",
        "INPUT.SIZE_TEST", "[64, 32]",
        "DATASETS.NAMES", "RGBNT201",
        "DATASETS.ROOT_DIR", tiny_root,
        "DATALOADER.NUM_INSTANCE", "2",
        "DATALOADER.NUM_WORKERS", "2",
        "SOLVER.IMS_PER_BATCH", "8",
        "SOLVER.MAX_EPOCHS", "2",
        "SOLVER.EVAL_PERIOD", "2",
        "SOLVER.CHECKPOINT_PERIOD", "2",
        "SOLVER.LOG_PERIOD", "1",
        "SOLVER.SEED", "7",
        "MODEL.FREQUENCY_KEEP", "3",
        "TPU.COMPUTE_DTYPE", "float32",
        "TPU.MESH_DATA", "1",
        "OUTPUT_DIR", out,
    ])
    # plumbing check only: a real mAP came back (learning quality is gated
    # by test_cli_train_learns_synthetic_identities below, which requires
    # mAP >= 0.9 on separable identities)
    assert np.isfinite(result["best"]["mAP"])
    assert result["best"]["mAP"] > 0.0
    assert os.path.exists(os.path.join(out, "train_log.txt"))
    assert os.path.exists(os.path.join(out, "config.yaml"))
    assert os.path.exists(os.path.join(out, "metrics.jsonl"))
    # full-state checkpoint written
    assert os.path.isdir(os.path.join(out, "ckpt"))


def test_cli_params():
    from editor_tpu.cli.params import main
    n = main(["MODEL.TRANSFORMER_TYPE", "vit_tiny_test",
              "INPUT.SIZE_TRAIN", "[64, 32]"])
    assert n > 0


def test_cli_params_flagship_exact():
    """Exact trainable-parameter parity with the published reference count
    (reference params.py:65-68 prints 118.55M; verified module-for-module
    against the reference model in round-1 review). num_class=50, camera=8,
    256x128, AL=0 — the reference params.py configuration."""
    from editor_tpu.cli.params import main
    n = main(["MODEL.TRANSFORMER_TYPE", "vit_base_patch16_224",
              "INPUT.SIZE_TRAIN", "[256, 128]",
              "MODEL.AL", "0"])
    assert n == 118_547_944, n


def test_cli_test_random_weights(tiny_root, tmp_path):
    from editor_tpu.cli.test import main
    cmc, mAP = main([
        "MODEL.TRANSFORMER_TYPE", "vit_tiny_test",
        "MODEL.DROP_PATH", "0.0",
        "INPUT.SIZE_TRAIN", "[64, 32]",
        "INPUT.SIZE_TEST", "[64, 32]",
        "DATASETS.NAMES", "RGBNT201",
        "DATASETS.ROOT_DIR", tiny_root,
        "MODEL.FREQUENCY_KEEP", "3",
        "TPU.COMPUTE_DTYPE", "float32",
        "TEST.IMS_PER_BATCH", "8",
        "OUTPUT_DIR", str(tmp_path / "out2"),
    ])
    assert 0.0 <= mAP <= 1.0


def test_cli_test_restores_train_checkpoint(tiny_root, tmp_path):
    """Regression: the eval CLI must accept the {'state': TrainState,
    'epoch': N} payload the training loop writes (engine/loop.py) — not just
    a bare params dict."""
    import jax
    import jax.numpy as jnp

    from editor_tpu.config import load_config
    from editor_tpu.engine.train import TrainState
    from editor_tpu.models.editor import editor_config_from, editor_init
    from editor_tpu.utils.checkpoint import CheckpointManager

    cfg = load_config(None, [
        "MODEL.TRANSFORMER_TYPE", "vit_tiny_test",
        "MODEL.DROP_PATH", "0.0",
        "INPUT.SIZE_TRAIN", "[64, 32]",
        "MODEL.FREQUENCY_KEEP", "3",
    ])
    ecfg = editor_config_from(cfg, 4, 2)
    params, mstate = editor_init(jax.random.PRNGKey(1), ecfg)
    state = TrainState(params=params, opt_state=None, model_state=mstate,
                       rng=jax.random.PRNGKey(0),
                       step=jnp.zeros((), jnp.int32))
    ckpt = str(tmp_path / "ckpt")
    mgr = CheckpointManager(ckpt, use_async=False)
    mgr.save(1, {"state": state, "epoch": 1})
    mgr.close()

    from editor_tpu.cli.test import main
    cmc, mAP = main([
        "MODEL.TRANSFORMER_TYPE", "vit_tiny_test",
        "MODEL.DROP_PATH", "0.0",
        "INPUT.SIZE_TRAIN", "[64, 32]",
        "INPUT.SIZE_TEST", "[64, 32]",
        "DATASETS.NAMES", "RGBNT201",
        "DATASETS.ROOT_DIR", tiny_root,
        "MODEL.FREQUENCY_KEEP", "3",
        "TPU.COMPUTE_DTYPE", "float32",
        "TEST.IMS_PER_BATCH", "8",
        "TEST.WEIGHT", ckpt,
        "OUTPUT_DIR", str(tmp_path / "out_restore"),
    ])
    assert np.isfinite(mAP)

    # the torch-export CLI consumes the same checkpoint layout
    from editor_tpu.cli.export import main as export_main
    out_pth = str(tmp_path / "exported.pth")
    sd = export_main([
        "--out", out_pth, "--num_classes", "4", "--camera_num", "2",
        "MODEL.TRANSFORMER_TYPE", "vit_tiny_test",
        "MODEL.DROP_PATH", "0.0",
        "INPUT.SIZE_TRAIN", "[64, 32]",
        "MODEL.FREQUENCY_KEEP", "3",
        "TEST.WEIGHT", ckpt,
    ])
    assert osp.exists(out_pth)
    assert "BACKBONE.base.cls_token" in sd
    assert "FUSE_block.out_norm.weight" in sd
    assert "BACKBONE_BN.running_mean" in sd


@pytest.mark.slow
def test_cli_train_tp_mesh(tiny_root, tmp_path):
    """do_train with TPU.MESH_MODEL=2: TP shardings applied through the
    config path; loss finite and artifacts written."""
    import jax
    if len(jax.devices()) < 8:  # real-chip runs (EDITOR_TPU_TEST_TPU=1)
        pytest.skip("needs the 8-device virtual mesh")
    from editor_tpu.cli.train import main
    out = str(tmp_path / "out_tp")
    result = main([
        "MODEL.TRANSFORMER_TYPE", "vit_tiny_test",
        "MODEL.PRETRAIN_CHOICE", "random",
        "MODEL.DROP_PATH", "0.0",
        "INPUT.SIZE_TRAIN", "[64, 32]",
        "INPUT.SIZE_TEST", "[64, 32]",
        "DATASETS.NAMES", "RGBNT201",
        "DATASETS.ROOT_DIR", tiny_root,
        "DATALOADER.NUM_INSTANCE", "2",
        "DATALOADER.NUM_WORKERS", "2",
        "SOLVER.IMS_PER_BATCH", "8",
        "SOLVER.MAX_EPOCHS", "1",
        "SOLVER.EVAL_PERIOD", "100",
        "SOLVER.CHECKPOINT_PERIOD", "100",
        "SOLVER.LOG_PERIOD", "1",
        "SOLVER.SEED", "7",
        "MODEL.FREQUENCY_KEEP", "3",
        "TPU.COMPUTE_DTYPE", "float32",
        "TPU.MESH_DATA", "4",
        "TPU.MESH_MODEL", "2",
        "SOLVER.CHECKPOINT_PERIOD", "1",
        "OUTPUT_DIR", out,
    ])
    assert result["state"] is not None
    log = open(os.path.join(out, "train_log.txt")).read()
    assert "Megatron-split" in log

    # checkpoints are CANONICAL-layout: forward-permuting the saved qkv
    # must reproduce the live (TP-layout) qkv, so the file loads into
    # non-TP runs and any tp factor
    import jax
    import numpy as np
    from editor_tpu.parallel.tp import permute_qkv_params
    from editor_tpu.utils.checkpoint import CheckpointManager
    mgr = CheckpointManager(os.path.join(out, "ckpt"))
    step = mgr.latest_step()
    assert step is not None
    live = jax.device_get(result["state"])
    saved = mgr.restore(step, template={"state": live, "epoch": 0})["state"]
    saved_p = saved.params if hasattr(saved, "params") else saved["params"]
    heads = result["ecfg"].vit.num_heads
    re_tp = permute_qkv_params(saved_p, heads, 2)
    a = np.asarray(
        re_tp["BACKBONE"]["blocks"]["attn"]["qkv"]["w"])
    b = np.asarray(live.params["BACKBONE"]["blocks"]["attn"]["qkv"]["w"])
    np.testing.assert_allclose(a, b, atol=1e-6)
    # and the raw saved layout really differs from the live TP layout
    raw = np.asarray(saved_p["BACKBONE"]["blocks"]["attn"]["qkv"]["w"])
    assert not np.allclose(raw, b)


@pytest.fixture(scope="module")
def separable_root(tmp_path_factory):
    """Strongly separable synthetic identities: each pid gets a distinct
    solid-color + geometric-pattern prototype, rendered under 2 cameras with
    mild noise. Retrieval on this data is near-trivially learnable — the
    trainability oracle SURVEY.md §4 calls for in a dataset-free environment."""
    root = str(tmp_path_factory.mktemp("learndata"))
    base = osp.join(root, "RGBNT201")
    n_pid = 8
    protos = {}
    for pid in range(n_pid):
        rng = np.random.RandomState(1000 + pid)
        img = np.zeros((64, 32, 3), np.float32)
        img[..., :] = rng.randint(0, 255, (3,))          # identity color
        r0, c0 = rng.randint(0, 48), rng.randint(0, 24)  # identity patch
        img[r0:r0 + 16, c0:c0 + 8] = rng.randint(0, 255, (3,))
        protos[pid] = img
    idx = 0
    for split, per_cam in (("train_171", 2), ("test", 2)):
        for pid in range(n_pid):
            for cam in (1, 2):
                for k in range(per_cam):
                    noisy = np.clip(protos[pid] + np.random.RandomState(
                        idx).randn(64, 32, 3) * 8, 0, 255).astype(np.uint8)
                    name = f"{pid:06d}_cam{cam}_{idx}.jpg"
                    for mod in ("RGB", "NI", "TI"):
                        p = osp.join(base, split, mod, name)
                        os.makedirs(osp.dirname(p), exist_ok=True)
                        Image.fromarray(noisy).save(p)
                    idx += 1
    return root


@pytest.mark.slow
def test_cli_train_learns_synthetic_identities(separable_root, tmp_path):
    """End-to-end LEARNING proof: mAP on separable synthetic identities must
    reach >=0.9 after training and clearly beat the untrained model — the
    strongest trainability claim available without real datasets (replaces a
    vacuous 0<=mAP<=1 check; reference training loop engine/processor.py)."""
    common = [
        "MODEL.TRANSFORMER_TYPE", "vit_tiny_test",
        "MODEL.PRETRAIN_CHOICE", "random",
        "MODEL.DROP_PATH", "0.0",
        "INPUT.SIZE_TRAIN", "[64, 32]",
        "INPUT.SIZE_TEST", "[64, 32]",
        "INPUT.RE_PROB", "0.0",
        "DATASETS.NAMES", "RGBNT201",
        "DATASETS.ROOT_DIR", separable_root,
        "MODEL.FREQUENCY_KEEP", "3",
        "TPU.COMPUTE_DTYPE", "float32",
        "TPU.MESH_DATA", "1",
    ]
    from editor_tpu.cli.test import main as test_main
    _, mAP_untrained = test_main(common + [
        "TEST.IMS_PER_BATCH", "8",
        "SOLVER.SEED", "3",
        "OUTPUT_DIR", str(tmp_path / "untrained"),
    ])

    from editor_tpu.cli.train import main as train_main
    result = train_main(common + [
        "DATALOADER.NUM_INSTANCE", "2",
        "DATALOADER.NUM_WORKERS", "2",
        "SOLVER.IMS_PER_BATCH", "8",
        "SOLVER.MAX_EPOCHS", "30",
        "SOLVER.WARMUP_ITERS", "2",
        "SOLVER.EVAL_PERIOD", "10",
        "SOLVER.CHECKPOINT_PERIOD", "30",
        "SOLVER.LOG_PERIOD", "4",
        "SOLVER.SEED", "3",
        "OUTPUT_DIR", str(tmp_path / "trained"),
    ])
    mAP = result["best"]["mAP"]
    assert mAP >= 0.9, (mAP, mAP_untrained)
    assert mAP > mAP_untrained + 0.2, (mAP, mAP_untrained)


@pytest.fixture(scope="module")
def wide_root(tmp_path_factory):
    """Synthetic RGBNT100 layout: single wide JPEGs (3 x 256-px tiles),
    regex-named `PID_cCAM_idx.jpg` (reference RGBNT100.py:64-89)."""
    root = str(tmp_path_factory.mktemp("widedata"))
    base = osp.join(root, "RGBNT100", "rgbir")
    protos = {pid: np.random.RandomState(200 + pid).randint(0, 255, (128, 768, 3))
              for pid in range(1, 5)}
    idx = 0
    for split, n in (("bounding_box_train", 16), ("query", 4),
                     ("bounding_box_test", 8)):
        for i in range(n):
            pid, cam = (i % 4) + 1, (i // 4) % 2 + 1
            noisy = np.clip(protos[pid] + np.random.RandomState(idx).randint(
                -15, 15, (128, 768, 3)), 0, 255).astype(np.uint8)
            p = osp.join(base, split, f"{pid:04d}_c{cam}_{idx:04d}.jpg")
            os.makedirs(osp.dirname(p), exist_ok=True)
            Image.fromarray(noisy).save(p)
            idx += 1
    return root


@pytest.mark.slow
def test_cli_train_rgbnt100_wide_jpeg(wide_root, tmp_path):
    """End-to-end train + eval on the wide-JPEG layout: exercises the
    single-decode multicrop tiling (native or PIL), the regex adapter, and
    the same engine path as RGBNT201."""
    from editor_tpu.cli.train import main
    out = str(tmp_path / "out_wide")
    result = main([
        "MODEL.TRANSFORMER_TYPE", "vit_tiny_test",
        "MODEL.PRETRAIN_CHOICE", "random",
        "MODEL.DROP_PATH", "0.0",
        "INPUT.SIZE_TRAIN", "[64, 32]",
        "INPUT.SIZE_TEST", "[64, 32]",
        "DATASETS.NAMES", "RGBNT100",
        "DATASETS.ROOT_DIR", wide_root,
        "DATALOADER.NUM_INSTANCE", "2",
        "DATALOADER.NUM_WORKERS", "2",
        "SOLVER.IMS_PER_BATCH", "8",
        "SOLVER.MAX_EPOCHS", "1",
        "SOLVER.EVAL_PERIOD", "1",
        "SOLVER.CHECKPOINT_PERIOD", "5",
        "SOLVER.LOG_PERIOD", "1",
        "MODEL.FREQUENCY_KEEP", "3",
        "TPU.COMPUTE_DTYPE", "float32",
        "TPU.MESH_DATA", "1",
        "OUTPUT_DIR", out,
    ])
    assert np.isfinite(result["best"]["mAP"]) and result["best"]["mAP"] > 0.0


@pytest.fixture(scope="module")
def msvr_root(tmp_path_factory):
    """Synthetic MSVR310 layout: per-vehicle dirs with vis/ni/th subdirs,
    scene+cam encoded in the name `PPPP_sSSS_vC_i.jpg`
    (reference msvr310.py:67-88). Query scenes differ from gallery scenes so
    the same-(pid, scene) exclusion leaves valid matches."""
    root = str(tmp_path_factory.mktemp("msvrdata"))
    base = osp.join(root, "MSVR310")
    protos = {pid: np.random.RandomState(300 + pid).randint(0, 255, (64, 32, 3))
              for pid in range(1, 5)}
    idx = 0

    def put(split, pid, scene, cam):
        nonlocal idx
        name = f"{pid:04d}_s{scene:03d}_v{cam}_{idx}.jpg"
        noisy = np.clip(protos[pid] + np.random.RandomState(idx).randint(
            -15, 15, (64, 32, 3)), 0, 255).astype(np.uint8)
        for mod in ("vis", "ni", "th"):
            p = osp.join(base, split, f"{pid:04d}", mod, name)
            os.makedirs(osp.dirname(p), exist_ok=True)
            Image.fromarray(noisy).save(p)
        idx += 1

    for pid in range(1, 5):
        for k in range(4):  # train: 2 scenes x 2 cams
            put("train", pid, scene=k % 2 + 1, cam=k // 2 + 1)
        put("query3", pid, scene=1, cam=1)
        put("bounding_box_test", pid, scene=2, cam=2)  # valid match
        put("bounding_box_test", pid, scene=1, cam=1)  # excluded by protocol
    return root


@pytest.mark.slow
def test_cli_train_msvr310_scene_protocol(msvr_root, tmp_path):
    """End-to-end train + eval on the MSVR310 layout: per-vehicle dirs,
    scene ids parsed from names, and the same-(pid, scene) gallery exclusion
    protocol flowing through the evaluator."""
    from editor_tpu.cli.train import main
    out = str(tmp_path / "out_msvr")
    result = main([
        "MODEL.TRANSFORMER_TYPE", "vit_tiny_test",
        "MODEL.PRETRAIN_CHOICE", "random",
        "MODEL.DROP_PATH", "0.0",
        "INPUT.SIZE_TRAIN", "[64, 32]",
        "INPUT.SIZE_TEST", "[64, 32]",
        "DATASETS.NAMES", "MSVR310",
        "DATASETS.ROOT_DIR", msvr_root,
        "DATALOADER.NUM_INSTANCE", "2",
        "DATALOADER.NUM_WORKERS", "2",
        "SOLVER.IMS_PER_BATCH", "8",
        "SOLVER.MAX_EPOCHS", "1",
        "SOLVER.EVAL_PERIOD", "1",
        "SOLVER.CHECKPOINT_PERIOD", "5",
        "SOLVER.LOG_PERIOD", "1",
        "MODEL.FREQUENCY_KEEP", "3",
        "TPU.COMPUTE_DTYPE", "float32",
        "TPU.MESH_DATA", "1",
        "OUTPUT_DIR", out,
    ])
    assert np.isfinite(result["best"]["mAP"]) and result["best"]["mAP"] > 0.0


def test_cli_train_fsdp_grad_accum(tiny_root, tmp_path):
    """do_train with TPU.ZERO_STAGE=3 (FSDP param+opt sharding) and
    TPU.GRAD_ACCUM=2 through the config path: loss finite, log mentions
    FSDP, checkpoint written."""
    import jax
    if len(jax.devices()) < 8:  # real-chip runs (EDITOR_TPU_TEST_TPU=1)
        pytest.skip("needs the 8-device virtual mesh")
    from editor_tpu.cli.train import main
    out = str(tmp_path / "out_fsdp")
    result = main([
        "MODEL.TRANSFORMER_TYPE", "vit_tiny_test",
        "MODEL.PRETRAIN_CHOICE", "random",
        "MODEL.DROP_PATH", "0.0",
        "INPUT.SIZE_TRAIN", "[64, 32]",
        "INPUT.SIZE_TEST", "[64, 32]",
        "DATASETS.NAMES", "RGBNT201",
        "DATASETS.ROOT_DIR", tiny_root,
        "DATALOADER.NUM_INSTANCE", "2",
        "DATALOADER.NUM_WORKERS", "2",
        "SOLVER.IMS_PER_BATCH", "8",
        "SOLVER.MAX_EPOCHS", "1",
        "SOLVER.EVAL_PERIOD", "100",
        "SOLVER.CHECKPOINT_PERIOD", "1",
        "SOLVER.LOG_PERIOD", "1",
        "SOLVER.SEED", "7",
        "MODEL.FREQUENCY_KEEP", "3",
        "TPU.COMPUTE_DTYPE", "float32",
        "TPU.MESH_DATA", "8",
        "TPU.MESH_MODEL", "1",
        "TPU.ZERO_STAGE", "3",
        "TPU.GRAD_ACCUM", "2",
        "OUTPUT_DIR", out,
    ])
    assert result["state"] is not None
    log = open(os.path.join(out, "train_log.txt")).read()
    assert "FSDP" in log
