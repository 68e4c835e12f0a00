"""ReID retrieval metrics: mAP + CMC, computed batched on device.

reference: utils/metrics.py — ``eval_func`` (:132-191) runs a *per-query
numpy loop* (sort, filter same pid+cam gallery entries, cumsum CMC/AP);
``R1_mAP_eval`` (:242-283) accumulates features and splits query/gallery.

TPU-native re-design: the entire protocol is masked cumulative algebra on
[Q, G] matrices — one argsort + gathers + cumsums, jit-able and shardable
over the query axis (the gallery distmat is the genuinely large tensor here,
SURVEY.md §5.7). Filtered ("junk") gallery entries are skipped by computing
each entry's *effective rank* = cumsum(keep) instead of compacting arrays,
so shapes stay static.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def euclidean_distmat(qf: Array, gf: Array) -> Array:
    """Squared-euclidean distance matrix (reference: metrics.py:12-18 keeps
    the squared form — monotonic, so rankings are identical)."""
    qf = qf.astype(jnp.float32)
    gf = gf.astype(jnp.float32)
    return (jnp.sum(qf * qf, 1, keepdims=True)
            + jnp.sum(gf * gf, 1, keepdims=True).T
            - 2.0 * qf @ gf.T)


@functools.partial(jax.jit, static_argnames=("max_rank",))
def _cmc_map_core(distmat: Array, q_pids: Array, g_pids: Array,
                  remove_mask: Array, max_rank: int = 50):
    """Vectorized eval_func core.

    remove_mask: [Q, G] bool — gallery entries to discard per query (same
    pid+camid in the market protocol; same pid+sceneid for MSVR310).
    """
    Q, G = distmat.shape
    order = jnp.argsort(distmat, axis=1)  # [Q, G]
    sorted_match = (jnp.take_along_axis(
        jnp.broadcast_to(g_pids[None, :], (Q, G)), order, axis=1)
        == q_pids[:, None])
    sorted_keep = ~jnp.take_along_axis(remove_mask, order, axis=1)

    eff_rank = jnp.cumsum(sorted_keep.astype(jnp.int32), axis=1)  # 1-based
    match_valid = sorted_match & sorted_keep

    num_rel = jnp.sum(match_valid, axis=1)  # matches per query
    valid_q = num_rel > 0

    # CMC: first effective rank at which a valid match occurs
    big = jnp.asarray(G + 1, jnp.int32)
    first_rank = jnp.min(jnp.where(match_valid, eff_rank, big), axis=1)
    ranks = jnp.arange(1, max_rank + 1)[None, :]  # [1, R]
    cmc_per_q = (first_rank[:, None] <= ranks).astype(jnp.float32)
    cmc = jnp.sum(jnp.where(valid_q[:, None], cmc_per_q, 0.0), axis=0)

    # AP: precision-at-match averaged over matches
    cum_match = jnp.cumsum(match_valid.astype(jnp.float32), axis=1)
    prec = cum_match / jnp.maximum(eff_rank.astype(jnp.float32), 1.0)
    ap = jnp.sum(jnp.where(match_valid, prec, 0.0), axis=1) / jnp.maximum(
        num_rel.astype(jnp.float32), 1)

    n_valid = jnp.sum(valid_q.astype(jnp.float32))
    cmc = cmc / n_valid
    mAP = jnp.sum(jnp.where(valid_q, ap, 0.0)) / n_valid
    return cmc, mAP, n_valid


def sharded_cmc_map(qf: Array, gf: Array, q_pids, g_pids, remove_mask,
                    mesh, max_rank: int = 50, axis: str = "data"):
    """Device-sharded eval for large galleries (SURVEY.md §5.7: the [Q, G]
    distmat is the genuinely large tensor — ~17k x 17k on Market-MM).

    Queries are sharded over the mesh's ``axis``; the gallery is replicated.
    Every per-query quantity (argsort row, cumsums, AP) is embarrassingly
    parallel over Q, so XLA partitions the whole computation with zero
    collectives until the final scalar reductions.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    d = mesh.shape[axis]
    Q = qf.shape[0]
    pad = (-Q) % d
    if pad:
        qf = jnp.concatenate([qf, jnp.zeros((pad, qf.shape[1]), qf.dtype)])
        q_pids = jnp.concatenate([q_pids, -jnp.ones((pad,), q_pids.dtype)])
        remove_mask = jnp.concatenate(
            [remove_mask, jnp.ones((pad, remove_mask.shape[1]), bool)])
    rows = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    @functools.partial(
        jax.jit,
        in_shardings=(rows, repl, rows, repl, rows),
        out_shardings=(repl, repl, repl),
        static_argnames=("max_rank",))
    def run(qf, gf, q_pids, g_pids, remove_mask, max_rank=max_rank):
        distmat = euclidean_distmat(qf, gf)
        return _cmc_map_core.__wrapped__(distmat, q_pids, g_pids,
                                         remove_mask, max_rank)

    # padded queries have pid -1 (never matches) → invalid, excluded
    cmc, mAP, n_valid = run(jnp.asarray(qf), jnp.asarray(gf),
                            jnp.asarray(q_pids), jnp.asarray(g_pids),
                            jnp.asarray(remove_mask))
    if float(n_valid) == 0:
        raise RuntimeError("all query identities absent from gallery")
    return np.asarray(cmc), float(mAP)


def cmc_map(distmat, q_pids, g_pids, q_camids, g_camids,
            max_rank: int = 50) -> Tuple[np.ndarray, float]:
    """Market1501 protocol: discard gallery entries with the query's
    (pid, camid) (reference: eval_func, metrics.py:132-191)."""
    distmat = jnp.asarray(distmat)
    q_pids = jnp.asarray(q_pids)
    g_pids = jnp.asarray(g_pids)
    remove = ((g_pids[None, :] == q_pids[:, None])
              & (jnp.asarray(g_camids)[None, :] == jnp.asarray(q_camids)[:, None]))
    max_rank = min(max_rank, distmat.shape[1])
    cmc, mAP, n_valid = _cmc_map_core(distmat, q_pids, g_pids, remove, max_rank)
    if float(n_valid) == 0:
        raise RuntimeError("all query identities absent from gallery")
    return np.asarray(cmc), float(mAP)


def cmc_map_msvr(distmat, q_pids, g_pids, q_camids, g_camids,
                 q_sceneids, g_sceneids, max_rank: int = 50):
    """MSVR310 protocol: discard same (pid, sceneid)
    (reference: eval_func_msrv, metrics.py:34-129)."""
    distmat = jnp.asarray(distmat)
    q_pids = jnp.asarray(q_pids)
    g_pids = jnp.asarray(g_pids)
    remove = ((g_pids[None, :] == q_pids[:, None])
              & (jnp.asarray(g_sceneids)[None, :]
                 == jnp.asarray(q_sceneids)[:, None]))
    max_rank = min(max_rank, distmat.shape[1])
    cmc, mAP, n_valid = _cmc_map_core(distmat, q_pids, g_pids, remove, max_rank)
    if float(n_valid) == 0:
        raise RuntimeError("all query identities absent from gallery")
    return np.asarray(cmc), float(mAP)


def write_rank_list(path: str, distmat, q_pids, g_pids, q_camids, g_camids,
                    q_sceneids, g_sceneids, max_rank: int = 50) -> None:
    """Write the MSVR310 per-query rank-list artifact (reference
    ``eval_func_msrv`` writes ``re.txt``, utils/metrics.py:59-99): a header
    line, then per query ``{pid}_s{scene}_v{cam}:`` followed by the top
    ``max_rank`` kept gallery entries in the same format."""
    distmat = np.asarray(distmat)
    order = np.argsort(distmat, axis=1)
    with open(path, "w") as f:
        f.write("rank list file\n")
        for qi in range(distmat.shape[0]):
            o = order[qi]
            keep = ~((g_pids[o] == q_pids[qi])
                     & (g_sceneids[o] == q_sceneids[qi]))
            f.write(f"{q_pids[qi]}_s{q_sceneids[qi]}_v{q_camids[qi]}:\n")
            kept = o[keep][:max_rank]
            f.write("".join(
                f"{g_pids[i]}_s{g_sceneids[i]}_v{g_camids[i]}  "
                for i in kept))
            f.write("\n")


class R1mAPEvaluator:
    """Feature accumulator + metric computation (reference R1_mAP_eval,
    metrics.py:242-283; MSVR310 variant R1_mAP, :193-239).

    ``rank_list_path``: when set (MSVR310 protocol), write the per-query
    rank-list artifact there (the reference's ``re.txt``)."""

    def __init__(self, num_query: int, max_rank: int = 50,
                 feat_norm: bool = True, reranking: bool = False,
                 msvr_protocol: bool = False,
                 rank_list_path: Optional[str] = None):
        self.num_query = num_query
        self.max_rank = max_rank
        self.feat_norm = feat_norm
        self.reranking = reranking
        self.msvr_protocol = msvr_protocol
        self.rank_list_path = rank_list_path
        self.reset()

    def reset(self):
        self.feats: List[np.ndarray] = []
        self.pids: List[np.ndarray] = []
        self.camids: List[np.ndarray] = []
        self.sceneids: List[np.ndarray] = []

    def update(self, feat, pid, camid, sceneid=None):
        self.feats.append(np.asarray(feat))
        self.pids.append(np.asarray(pid))
        self.camids.append(np.asarray(camid))
        if sceneid is not None:
            self.sceneids.append(np.asarray(sceneid))

    def compute(self):
        feats = jnp.asarray(np.concatenate(self.feats, axis=0))
        if self.feat_norm:
            feats = feats / jnp.linalg.norm(feats, axis=1, keepdims=True)
        nq = self.num_query
        qf, gf = feats[:nq], feats[nq:]
        pids = np.concatenate(self.pids)
        camids = np.concatenate(self.camids)
        q_pids, g_pids = pids[:nq], pids[nq:]
        q_camids, g_camids = camids[:nq], camids[nq:]
        if self.reranking:
            from editor_tpu.native import rerank_auto
            distmat = rerank_auto(np.asarray(qf), np.asarray(gf),
                                  k1=50, k2=15, lambda_value=0.3)
        else:
            distmat = euclidean_distmat(qf, gf)
        if self.msvr_protocol:
            sceneids = np.concatenate(self.sceneids)
            cmc, mAP = cmc_map_msvr(distmat, q_pids, g_pids, q_camids,
                                    g_camids, sceneids[:nq], sceneids[nq:],
                                    self.max_rank)
            if self.rank_list_path:
                write_rank_list(self.rank_list_path, distmat, q_pids, g_pids,
                                q_camids, g_camids, sceneids[:nq],
                                sceneids[nq:], self.max_rank)
        else:
            cmc, mAP = cmc_map(distmat, q_pids, g_pids, q_camids, g_camids,
                               self.max_rank)
        return cmc, mAP, np.asarray(distmat), pids, camids, qf, gf
