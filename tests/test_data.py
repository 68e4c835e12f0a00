import os
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from editor_tpu.config import Config
from editor_tpu.data import (
    PKSampler,
    ReIDDataModule,
    load_dataset,
)
from editor_tpu.data.loader import BatchLoader, decode_item
from editor_tpu.data.transforms import (
    make_eval_transform,
    make_train_augment,
    pad_random_crop,
    random_erasing,
    random_hflip,
)


def _save(path, w=32, h=64, seed=0):
    os.makedirs(osp.dirname(path), exist_ok=True)
    rng = np.random.RandomState(seed)
    Image.fromarray(rng.randint(0, 255, (h, w, 3), dtype=np.uint8)).save(path)


@pytest.fixture(scope="module")
def rgbnt201_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("data201"))
    base = osp.join(root, "RGBNT201")
    for split in ("train_171", "test"):
        for i in range(8):
            pid, cam = i % 4, i % 2 + 1
            name = f"{pid:06d}_cam{cam}_{i}.jpg"
            for mod in ("RGB", "NI", "TI"):
                _save(osp.join(base, split, mod, name), seed=i)
    return root


@pytest.fixture(scope="module")
def rgbnt100_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("data100"))
    base = osp.join(root, "RGBNT100", "rgbir")
    for split in ("bounding_box_train", "query", "bounding_box_test"):
        for i in range(6):
            pid, cam = i % 3 + 1, i % 2 + 1
            # wide jpeg: 3 tiles of 256x128
            _save(osp.join(base, split, f"{pid:04d}_c{cam}_{i}.jpg"),
                  w=768, h=128, seed=i)
    return root


def test_rgbnt201_adapter(rgbnt201_root):
    ds = load_dataset("RGBNT201", rgbnt201_root)
    assert ds.num_train_pids == 4
    assert len(ds.train) == 8
    # relabel makes train pids contiguous from 0
    assert sorted({it[1] for it in ds.train}) == [0, 1, 2, 3]
    paths, pid, camid, _ = ds.train[0]
    assert len(paths) == 3 and camid in (0, 1)


def test_rgbnt100_adapter_and_wide_decode(rgbnt100_root):
    ds = load_dataset("RGBNT100", rgbnt100_root)
    assert ds.wide_jpeg
    mods = decode_item(ds.train[0][0], (128, 256), wide_jpeg=True,
                       num_modalities=3)
    assert len(mods) == 3
    assert mods[0].shape == (128, 256, 3)
    # different tiles -> different content
    assert not np.array_equal(mods[0], mods[1])


def test_pk_sampler_structure():
    items = [(None, pid, 0, -1) for pid in np.repeat(np.arange(6), 8)]
    s = PKSampler(items, batch_size=8, num_instances=4, seed=3)
    idx = s.epoch_indices(epoch=1)
    assert len(idx) % 8 == 0
    pids = np.asarray([items[i][1] for i in idx])
    for b in range(len(idx) // 8):
        batch = pids[b * 8:(b + 1) * 8]
        # P=2 ids x K=4 instances
        vals, counts = np.unique(batch, return_counts=True)
        assert len(vals) == 2 and all(counts == 4)
    # determinism
    np.testing.assert_array_equal(idx, s.epoch_indices(1))
    assert not np.array_equal(idx, s.epoch_indices(2))


def test_pk_sampler_host_shard():
    items = [(None, pid, 0, -1) for pid in np.repeat(np.arange(8), 8)]
    s = PKSampler(items, batch_size=16, num_instances=4, seed=0)
    full = s.epoch_indices(5)
    shards = [s.host_shard(5, h, 2) for h in range(2)]
    # each global batch = concat of per-host blocks
    for b in range(len(full) // 16):
        np.testing.assert_array_equal(
            full[b * 16:(b + 1) * 16],
            np.concatenate([sh[b * 8:(b + 1) * 8] for sh in shards]))


def test_softmax_sampler_host_shard():
    """SAMPLER='softmax' must host-shard like PKSampler — without this,
    every process in a multi-host run contributes the identical full batch
    (silent nproc-fold sample duplication)."""
    from editor_tpu.data.sampler import SoftmaxSampler
    s = SoftmaxSampler(64, batch_size=16, seed=3)
    full = s.epoch_indices(5)
    shards = [s.host_shard(5, h, 2) for h in range(2)]
    for b in range(len(full) // 16):
        np.testing.assert_array_equal(
            full[b * 16:(b + 1) * 16],
            np.concatenate([sh[b * 8:(b + 1) * 8] for sh in shards]))
    # disjoint per-batch blocks
    assert not set(shards[0]) & set(shards[1]) or len(set(full)) < len(full)


def test_transforms_shapes_and_determinism():
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.RandomState(0).rand(4, 32, 16, 3), jnp.float32)
    f = random_hflip(key, x, 1.0)
    np.testing.assert_allclose(np.asarray(f), np.asarray(x[:, :, ::-1, :]))
    c = pad_random_crop(key, x, 5)
    assert c.shape == x.shape
    e = random_erasing(key, x, prob=1.0)
    assert e.shape == x.shape
    assert not np.allclose(np.asarray(e), np.asarray(x))  # something erased
    e0 = random_erasing(key, x, prob=0.0)
    np.testing.assert_array_equal(np.asarray(e0), np.asarray(x))


def test_train_augment_pipeline():
    cfg = Config()
    aug = make_train_augment(cfg.INPUT)
    imgs = jnp.asarray(np.random.randint(0, 255, (4, 32, 16, 3)), jnp.uint8)
    out = jax.jit(aug)(jax.random.PRNGKey(1), imgs)
    assert out.shape == (4, 32, 16, 3)
    assert out.dtype == jnp.float32
    ev = make_eval_transform(cfg.INPUT)(imgs)
    assert abs(float(jnp.mean(ev))) < 0.5  # roughly centered


def test_datamodule_end_to_end(rgbnt201_root):
    cfg = Config()
    cfg.DATASETS.NAMES = "RGBNT201"
    cfg.DATASETS.ROOT_DIR = rgbnt201_root
    cfg.INPUT.SIZE_TRAIN = (64, 32)
    cfg.INPUT.SIZE_TEST = (64, 32)
    cfg.SOLVER.IMS_PER_BATCH = 8
    cfg.DATALOADER.NUM_INSTANCE = 2
    cfg.DATALOADER.NUM_WORKERS = 2
    cfg.TEST.IMS_PER_BATCH = 6
    dm = ReIDDataModule(cfg)
    assert dm.num_classes == 4
    batches = list(dm.train_epoch(1))
    assert batches, "expected at least one train batch"
    b = batches[0]
    assert b["RGB"].shape == (8, 64, 32, 3) and b["RGB"].dtype == np.uint8
    assert set(b) >= {"RGB", "NI", "TI", "pid", "camid"}
    vb = list(dm.val_batches())
    n_items = len(dm.val_items)
    assert sum(v["RGB"].shape[0] for v in vb) == n_items + dm.val_pad
    assert all(v["RGB"].shape[0] == 6 for v in vb)  # static batch shape


# ---------------------------------------------------------------------------
# single-modal adapters (reference make_dataloader.py:20-29 factory rows)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def market1501_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("market"))
    base = osp.join(root, "market1501")
    for split in ("bounding_box_train", "query", "bounding_box_test"):
        for i in range(8):
            pid, cam = i % 4, i % 3 + 1
            _save(osp.join(base, split, f"{pid:04d}_c{cam}s1_{i:06d}_00.jpg"),
                  seed=i)
        # junk image (pid == -1) must be skipped (market1501.py:70-76)
        _save(osp.join(base, split, f"-1_c1s1_{900:06d}_00.jpg"))
    return root


def test_market1501_adapter(market1501_root):
    ds = load_dataset("market1501", market1501_root)
    assert ds.num_modalities == 1
    assert ds.num_train_pids == 4
    assert len(ds.train) == 8  # junk excluded
    paths, pid, camid, _ = ds.train[0]
    assert len(paths) == 1 and 0 <= camid <= 2
    # single-modal decode duplicates the image across modality slots
    mods = decode_item(paths, (64, 32), wide_jpeg=False, num_modalities=1)
    assert len(mods) == 3
    assert np.array_equal(mods[0], mods[1]) and np.array_equal(mods[1], mods[2])


def test_dukemtmcreid_adapter(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("duke"))
    base = osp.join(root, "dukemtmc-reid", "DukeMTMC-reID")
    for split in ("bounding_box_train", "query", "bounding_box_test"):
        for i in range(6):
            pid, cam = 7000 + i % 3, i % 2 + 1
            _save(osp.join(base, split, f"{pid:04d}_c{cam}_f{i:07d}.jpg"),
                  seed=i)
    ds = load_dataset("dukemtmcreid", root)
    assert ds.num_train_pids == 3 and len(ds.query) == 6
    assert sorted({it[1] for it in ds.train}) == [0, 1, 2]  # relabeled


def test_msmt17_adapter(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("msmt"))
    base = osp.join(root, "MSMT17")
    os.makedirs(osp.join(base, "mask_train_v2"), exist_ok=True)
    os.makedirs(osp.join(base, "mask_test_v2"), exist_ok=True)
    def write_list(name, dirname, n, pid0=0):
        lines = []
        for i in range(n):
            pid, cam = pid0 + i % 2, i % 3 + 1
            rel = f"{pid:04d}/{pid:04d}_{i:03d}_{cam:02d}_morning.jpg"
            _save(osp.join(base, dirname, rel), seed=i)
            lines.append(f"{rel} {pid}\n")
        with open(osp.join(base, name), "w") as fh:
            fh.writelines(lines)
    write_list("list_train.txt", "mask_train_v2", 4)
    write_list("list_val.txt", "mask_train_v2", 2)
    write_list("list_query.txt", "mask_test_v2", 4)
    write_list("list_gallery.txt", "mask_test_v2", 4)
    ds = load_dataset("msmt17", root)
    assert len(ds.train) == 6  # train + val concatenated (msmt17.py:38-40)
    assert ds.num_train_pids == 2
    assert all(0 <= it[2] <= 2 for it in ds.train)


def test_read_image_retry(tmp_path):
    from editor_tpu.data.loader import _read_image
    with pytest.raises(IOError):
        _read_image(str(tmp_path / "missing.jpg"))
    p = str(tmp_path / "ok.jpg")
    _save(p)
    assert _read_image(p).size == (32, 64)
