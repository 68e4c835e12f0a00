"""Host input-pipeline throughput: JPEG decode + resize + batch assembly.

Generates a synthetic on-disk RGBNT201-style tree (tri-modal 256x128 JPEGs),
then measures BatchLoader end-to-end images/sec (native imagecodec path when
available, PIL thread-pool fallback otherwise) — evidence the host can feed
the chip's measured eval rate (BASELINE.md) with headroom.

Usage: python tools/bench_loader.py [num_ids] [num_workers]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image


def make_tree(root: str, ids: int = 32, per_id: int = 8):
    rng = np.random.RandomState(0)
    for mod in ("RGB", "NI", "TI"):
        d = os.path.join(root, "RGBNT201", "train_171", mod)
        os.makedirs(d, exist_ok=True)
        for pid in range(ids):
            for k in range(per_id):
                arr = rng.randint(0, 255, (256, 128, 3), np.uint8)
                Image.fromarray(arr).save(
                    os.path.join(d, f"{pid:06d}_cam{k % 4 + 1}_{k}.jpg"),
                    quality=90)


def main():
    ids = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    workers = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from editor_tpu.config import Config
    from editor_tpu.data.loader import ReIDDataModule
    from editor_tpu.native import load_imagecodec

    with tempfile.TemporaryDirectory() as root:
        make_tree(root, ids=ids)
        cfg = Config()
        cfg.DATASETS.NAMES = "RGBNT201"
        cfg.DATASETS.ROOT_DIR = root
        cfg.INPUT.SIZE_TRAIN = [256, 128]
        cfg.INPUT.SIZE_TEST = [256, 128]
        cfg.DATALOADER.NUM_WORKERS = workers
        cfg.SOLVER.IMS_PER_BATCH = 128
        cfg.DATALOADER.NUM_INSTANCE = 8
        print(f"native imagecodec: {'yes' if load_imagecodec() else 'no (PIL)'}"
              f", workers={workers}, cores={os.cpu_count()}")
        # NOTE: on 1-core shared VMs these wall numbers are very noisy —
        # take the best of the repeats.
        for native in (True, False):
            cfg.DATALOADER.NATIVE_DECODE = native
            dm = ReIDDataModule(cfg)
            list(dm.train_epoch(epoch=0))  # warm: thread pool + page cache
            best = 0.0
            for _ in range(3):
                n = 0
                t0 = time.perf_counter()
                for batch in dm.train_epoch(epoch=1):
                    n += batch["RGB"].shape[0]
                dt = time.perf_counter() - t0
                best = max(best, n / dt)
            # n tri-modal samples => 3n JPEG decodes
            print(f"{'native codec' if native else 'PIL pool    '}: best "
                  f"{best:7.1f} samples/s ({3 * best:7.1f} decodes/s)")


if __name__ == "__main__":
    main()
