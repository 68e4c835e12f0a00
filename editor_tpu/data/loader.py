"""Host-side data loading: decode + batch assembly + prefetch.

reference: data/datasets/make_dataloader.py:244-308 (make_dataloader),
bases.py:9-41 (read_image incl. the wide-JPEG 256-px modality crop),
collate fns (:190-241; 2-modal datasets duplicate NI as TI).

TPU-first split of responsibilities: the host ONLY decodes JPEGs and resizes
(PIL, thread pool — JPEG decode releases the GIL); batches ship to device as
uint8 (3 bytes/pixel over PCIe instead of 12 for fp32) and ALL augmentation
runs inside the jitted train step (editor_tpu/data/transforms.py). A
background prefetch thread keeps one batch ahead of the step loop.
"""

from __future__ import annotations

import os.path as osp
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from editor_tpu.data.datasets import DatasetSplits, load_dataset
from editor_tpu.data.sampler import PKSampler, SoftmaxSampler

try:  # Pillow is optional at import time (synthetic tests stub decode)
    from PIL import Image
except Exception:  # pragma: no cover
    Image = None

MODALITY_KEYS = ("RGB", "NI", "TI")
WIDE_TILE_W = 256  # wide-JPEG modality tile width (bases.py:21-26)
WIDE_TILE_H = 128


def _read_image(path: str, retries: int = 20):
    """PIL open with an IOError retry loop (reference read_image,
    data/datasets/bases.py:9-41: keeps retrying truncated/locked files)."""
    if not osp.exists(path):
        raise IOError(f"{path} does not exist")
    last_err = None
    for _ in range(retries):
        try:
            return Image.open(path).convert("RGB")
        except IOError as e:  # pragma: no cover - transient FS failures
            last_err = e
    raise last_err


def decode_item(paths, size_hw: Tuple[int, int], wide_jpeg: bool,
                num_modalities: int) -> List[np.ndarray]:
    """Decode one item into per-modality uint8 [H,W,3] arrays, resized with
    bicubic interpolation to ``size_hw`` (reference transform Resize(...,3))."""
    h, w = size_hw
    out: List[np.ndarray] = []
    if wide_jpeg:
        img = _read_image(paths)
        n_tiles = img.size[0] // WIDE_TILE_W
        for i in range(min(n_tiles, num_modalities)):
            tile = img.crop((WIDE_TILE_W * i, 0, WIDE_TILE_W * (i + 1),
                             WIDE_TILE_H))
            out.append(np.asarray(tile.resize((w, h), Image.BICUBIC)))
    else:
        for p in paths[:num_modalities]:
            img = _read_image(p)
            out.append(np.asarray(img.resize((w, h), Image.BICUBIC)))
    while len(out) < 3:  # 2-modal: duplicate NI as TI (collate semantics)
        out.append(out[-1])
    return out


def decode_batch_native(items, size_hw: Tuple[int, int], wide_jpeg: bool,
                        num_modalities: int) -> List[List[np.ndarray]]:
    """One native call decodes + bicubic-resizes the whole batch in
    parallel (editor_tpu/native/imagecodec.cpp — the C++ hot loop the
    reference reaches through DataLoader worker processes). Raises
    RuntimeError when the native library is unavailable (caller falls back
    to the PIL thread pool)."""
    from editor_tpu.native import decode_resize_batch, decode_resize_multicrop
    h, w = size_hw
    n = len(items)
    if wide_jpeg:
        # decode each wide JPEG once, emit one crop per modality tile
        paths = [it[0] for it in items]
        crops = [[t * WIDE_TILE_W for t in range(num_modalities)]
                 for _ in items]
        arr = decode_resize_multicrop(paths, (h, w), crops,
                                      crop_w=WIDE_TILE_W, crop_h=WIDE_TILE_H)
    else:
        paths = [p for it in items for p in it[0][:num_modalities]]
        arr = decode_resize_batch(paths, (h, w))
    arr = arr.reshape(n, num_modalities, h, w, 3)
    out = [[arr[i, m] for m in range(num_modalities)] for i in range(n)]
    for mods in out:
        while len(mods) < 3:  # 2-modal: duplicate NI as TI
            mods.append(mods[-1])
    return out


class BatchLoader:
    """Assembles index lists into device-ready uint8 batches with prefetch."""

    def __init__(self, splits_items: Sequence, size_hw: Tuple[int, int],
                 wide_jpeg: bool, num_modalities: int,
                 has_sceneid: bool = False, num_workers: int = 8,
                 prefetch: int = 2,
                 decode_fn: Optional[Callable] = None,
                 native_decode: bool = False):
        self.items = splits_items
        self.size_hw = size_hw
        self.wide_jpeg = wide_jpeg
        self.num_modalities = num_modalities
        self.has_sceneid = has_sceneid
        # NUM_WORKERS=0 means synchronous decode in torch; a 1-thread
        # pool gives the same effective behavior here
        self.pool = ThreadPoolExecutor(max_workers=max(num_workers, 1))
        self.prefetch = prefetch
        self.decode_fn = decode_fn or (lambda item: decode_item(
            item[0], self.size_hw, self.wide_jpeg, self.num_modalities))
        # native batch decode only applies to the default path (a custom
        # decode_fn — synthetic tests — must keep per-item semantics)
        self.native_decode = native_decode and decode_fn is None
        self._native_fail_streak = 0

    def _assemble(self, idxs: np.ndarray) -> Dict[str, np.ndarray]:
        items = [self.items[i] for i in idxs]
        decoded = None
        if self.native_decode:
            try:
                decoded = decode_batch_native(
                    items, self.size_hw, self.wide_jpeg,
                    self.num_modalities)
                self._native_fail_streak = 0
            except RuntimeError as e:
                import logging
                log = logging.getLogger("editor_tpu.data")
                if "unavailable" in str(e):
                    # no toolchain/libjpeg at all: stop trying
                    self.native_decode = False
                    log.warning("native decode unavailable (%s); "
                                "using the PIL path", e)
                else:
                    # a transient per-file failure (truncated file mid-write,
                    # one odd format) must not permanently drop throughput:
                    # PIL (with its retry loop) covers THIS batch; only give
                    # up on the fast path if every batch keeps failing
                    self._native_fail_streak += 1
                    if self._native_fail_streak >= 3:
                        self.native_decode = False
                    log.warning(
                        "native batch decode failed (%s); PIL fallback for "
                        "this batch%s", e,
                        "" if self.native_decode
                        else " — disabling native decode after 3 "
                             "consecutive failures")
        if decoded is None:
            decoded = list(self.pool.map(self.decode_fn, items))
        batch: Dict[str, np.ndarray] = {}
        for m, key in enumerate(MODALITY_KEYS):
            batch[key] = np.stack([d[m] for d in decoded]).astype(np.uint8)
        batch["pid"] = np.asarray([it[1] for it in items], np.int32)
        batch["camid"] = np.asarray([it[2] for it in items], np.int32)
        if self.has_sceneid:
            batch["sceneid"] = np.asarray([it[3] for it in items], np.int32)
        return batch

    def batches(self, index_list: np.ndarray,
                batch_size: int) -> Iterator[Dict[str, np.ndarray]]:
        """Yield prefetched batches over ``index_list`` (drops the remainder)."""
        n = len(index_list) // batch_size
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def producer():
            try:
                for b in range(n):
                    idxs = index_list[b * batch_size:(b + 1) * batch_size]
                    q.put(self._assemble(idxs))
            finally:
                q.put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item
        t.join()


class ReIDDataModule:
    """make_dataloader equivalent (reference: make_dataloader.py:244-308).

    Exposes: train_epoch(epoch) batches, val_batches(), num_query,
    num_classes, cam_num.
    """

    def __init__(self, cfg: Any, splits: Optional[DatasetSplits] = None,
                 decode_fn: Optional[Callable] = None):
        self.cfg = cfg
        self.splits = splits or load_dataset(cfg.DATASETS.NAMES,
                                             cfg.DATASETS.ROOT_DIR)
        s = self.splits
        self.num_classes = s.num_train_pids
        self.cam_num = s.num_train_cams
        self.view_num = 0
        self.num_query = s.num_query
        size_train = tuple(cfg.INPUT.SIZE_TRAIN)
        size_test = tuple(cfg.INPUT.SIZE_TEST)
        nw = cfg.DATALOADER.NUM_WORKERS
        native = bool(getattr(cfg.DATALOADER, "NATIVE_DECODE", False))
        self.train_loader = BatchLoader(
            s.train, size_train, s.wide_jpeg, s.num_modalities,
            num_workers=nw, decode_fn=decode_fn, native_decode=native)
        self.val_items = list(s.query) + list(s.gallery)
        self.val_loader = BatchLoader(
            self.val_items, size_test, s.wide_jpeg, s.num_modalities,
            has_sceneid=s.has_sceneid, num_workers=nw, decode_fn=decode_fn,
            native_decode=native)
        if cfg.DATALOADER.SAMPLER in ("softmax_triplet", "triplet"):
            self.sampler = PKSampler(s.train, cfg.SOLVER.IMS_PER_BATCH,
                                     cfg.DATALOADER.NUM_INSTANCE,
                                     seed=cfg.SOLVER.SEED)
        else:
            self.sampler = SoftmaxSampler(len(s.train),
                                          cfg.SOLVER.IMS_PER_BATCH,
                                          seed=cfg.SOLVER.SEED)

    def train_epoch(self, epoch: int, host_id: int = 0, num_hosts: int = 1):
        if num_hosts > 1:
            # every sampler host-shards: each host contributes a DISJOINT
            # block of the deterministic global batch (sampler_ddp.py:159-168)
            idxs = self.sampler.host_shard(epoch, host_id, num_hosts)
            bs = self.cfg.SOLVER.IMS_PER_BATCH // num_hosts
        else:
            idxs = self.sampler.epoch_indices(epoch)
            bs = self.cfg.SOLVER.IMS_PER_BATCH
        return self.train_loader.batches(idxs, bs)

    def val_batches(self, batch_size: Optional[int] = None):
        bs = batch_size or self.cfg.TEST.IMS_PER_BATCH
        n = len(self.val_items)
        # pad the tail batch by repeating the last item so shapes stay static
        idxs = np.arange(n)
        pad = (-n) % bs
        if pad:
            idxs = np.concatenate([idxs, np.full(pad, n - 1)])
        self._val_pad = pad
        return self.val_loader.batches(idxs, bs)

    @property
    def val_pad(self) -> int:
        return getattr(self, "_val_pad", 0)
