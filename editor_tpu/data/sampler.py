"""Identity-balanced P×K batch sampling.

reference: data/datasets/sampler.py:7-66 (RandomIdentitySampler) and
sampler_ddp.py:64-197 (the DDP variant that gloo-all_gathers a pickled shared
seed and slices per-rank blocks).

TPU-native re-design: a *deterministic* host-side index generator seeded by
(seed, epoch). Multi-host data parallelism needs no pickle collectives — every
host computes the identical global permutation from the same seed (the
reference's shared_random_seed trick collapses to `fold_in(seed, epoch)`) and
slices its contiguous per-host block (sampler_ddp.py:159-168 equivalent).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Sequence

import numpy as np


class PKSampler:
    """Yields epochs of indices grouped as P ids × K instances per batch."""

    def __init__(self, items: Sequence, batch_size: int, num_instances: int,
                 seed: int = 0):
        if batch_size % num_instances != 0:
            raise ValueError("batch_size must be divisible by num_instances")
        self.batch_size = batch_size
        self.num_instances = num_instances
        self.num_pids_per_batch = batch_size // num_instances
        self.seed = seed
        self.index_by_pid: Dict[int, List[int]] = defaultdict(list)
        for idx, item in enumerate(items):
            self.index_by_pid[item[1]].append(idx)
        self.pids = sorted(self.index_by_pid)
        # epoch length estimate (reference: sampler.py:28-35)
        self.length = 0
        for pid in self.pids:
            num = max(len(self.index_by_pid[pid]), num_instances)
            self.length += num - num % num_instances

    def epoch_indices(self, epoch: int) -> np.ndarray:
        """Full-epoch index array, length a multiple of batch_size.

        Mirrors the reference algorithm (sampler.py:37-62): per-pid shuffled
        chunks of K, then batches assembled from P random available pids.
        """
        rng = np.random.RandomState((self.seed * 1_000_003 + epoch) % (2**31))
        chunks: Dict[int, List[np.ndarray]] = {}
        for pid in self.pids:
            idxs = np.asarray(self.index_by_pid[pid])
            if len(idxs) < self.num_instances:
                idxs = rng.choice(idxs, size=self.num_instances, replace=True)
            rng.shuffle(idxs)
            n_full = len(idxs) // self.num_instances
            chunks[pid] = [
                idxs[i * self.num_instances:(i + 1) * self.num_instances]
                for i in range(n_full)
            ]
        avail = [pid for pid in self.pids if chunks[pid]]
        out: List[np.ndarray] = []
        while len(avail) >= self.num_pids_per_batch:
            sel = rng.choice(len(avail), self.num_pids_per_batch, replace=False)
            selected = [avail[i] for i in sel]
            for pid in selected:
                out.append(chunks[pid].pop(0))
                if not chunks[pid]:
                    avail.remove(pid)
        if not out:
            return np.empty((0,), dtype=np.int64)
        return np.concatenate(out).astype(np.int64)

    def host_shard(self, epoch: int, host_id: int, num_hosts: int) -> np.ndarray:
        """Per-host contiguous block slice of each global batch (the DDP
        sampler's mini-batch split, sampler_ddp.py:159-168 /
        make_dataloader.py:272-282)."""
        full = self.epoch_indices(epoch)
        n_batches = len(full) // self.batch_size
        per_host = self.batch_size // num_hosts
        out = []
        for b in range(n_batches):
            base = b * self.batch_size + host_id * per_host
            out.append(full[base: base + per_host])
        if not out:
            return np.empty((0,), dtype=np.int64)
        return np.concatenate(out)


class SoftmaxSampler:
    """Plain shuffled sampling for SAMPLER='softmax' mode."""

    def __init__(self, num_items: int, batch_size: int, seed: int = 0):
        self.num_items = num_items
        self.batch_size = batch_size
        self.seed = seed

    def epoch_indices(self, epoch: int) -> np.ndarray:
        rng = np.random.RandomState((self.seed * 1_000_003 + epoch) % (2**31))
        idx = rng.permutation(self.num_items)
        n = (len(idx) // self.batch_size) * self.batch_size
        return idx[:n].astype(np.int64)

    def host_shard(self, epoch: int, host_id: int, num_hosts: int) -> np.ndarray:
        """Per-host contiguous block of each global batch — same contract
        as PKSampler.host_shard, so multi-process training shards ANY
        sampler instead of silently feeding every host the full batch."""
        full = self.epoch_indices(epoch)
        n_batches = len(full) // self.batch_size
        per_host = self.batch_size // num_hosts
        out = [full[b * self.batch_size + host_id * per_host:
                    b * self.batch_size + (host_id + 1) * per_host]
               for b in range(n_batches)]
        if not out:
            return np.empty((0,), dtype=np.int64)
        return np.concatenate(out)


class CyclingIterator:
    """Cycle a per-epoch iterator n times (reference
    elastic/utils/data/cycling_iterator.py): ``generator_fn(epoch)`` builds
    the k-th cycle's iterator — "unrolls" the dataset across epochs so an
    elastic training loop can consume one continuous stream."""

    def __init__(self, n: int, generator_fn, start_epoch: int = 0):
        self._n = n
        self._epoch = start_epoch
        self._generator_fn = generator_fn
        self._iter = generator_fn(self._epoch)

    def __iter__(self):
        return self

    def __next__(self):
        while True:
            try:
                return next(self._iter)
            except StopIteration:
                if self._epoch >= self._n - 1:
                    raise
                self._epoch += 1
                self._iter = self._generator_fn(self._epoch)


class IdentitySampler:
    """Cross-modal identity sampler (reference data/datasets/sampler.py:69-103,
    defined but unused on the reference's main path — kept for capability
    parity): per batch, choose ``batch_size`` identities without replacement
    and ``num_pos`` samples per identity from EACH modality's index lists."""

    def __init__(self, color_labels, thermal_labels, color_pos, thermal_pos,
                 num_pos: int, batch_size: int, seed: int = 0):
        rng = np.random.RandomState(seed)
        uni = np.unique(color_labels)
        N = max(len(color_labels), len(thermal_labels))
        idx1, idx2 = [], []
        for _ in range(N // (batch_size * num_pos) + 1):
            batch_ids = rng.choice(uni, batch_size, replace=False)
            for pid in batch_ids:
                idx1.append(rng.choice(color_pos[pid], num_pos))
                idx2.append(rng.choice(thermal_pos[pid], num_pos))
        self.index1 = np.concatenate(idx1)
        self.index2 = np.concatenate(idx2)
        self.N = N

    def __iter__(self):
        return iter(np.arange(len(self.index1)))

    def __len__(self):
        return self.N
