import numpy as np
import pytest

from editor_tpu.evals import R1mAPEvaluator, cmc_map, euclidean_distmat
from editor_tpu.evals.reranking import k_reciprocal_rerank


def naive_eval(distmat, q_pids, g_pids, q_camids, g_camids, max_rank=50):
    """Independent per-query loop implementing the market1501 protocol
    (spec: utils/metrics.py:132-191) for cross-checking the vectorized path."""
    num_q, num_g = distmat.shape
    max_rank = min(max_rank, num_g)
    indices = np.argsort(distmat, axis=1)
    all_cmc, all_ap = [], []
    for qi in range(num_q):
        order = indices[qi]
        remove = (g_pids[order] == q_pids[qi]) & (g_camids[order] == q_camids[qi])
        keep = ~remove
        matches = (g_pids[order] == q_pids[qi]).astype(np.int32)[keep]
        if not matches.any():
            continue
        cmc = matches.cumsum()
        cmc[cmc > 1] = 1
        all_cmc.append(cmc[:max_rank])
        num_rel = matches.sum()
        tmp = matches.cumsum() / np.arange(1, matches.size + 1)
        all_ap.append((tmp * matches).sum() / num_rel)
    cmc = np.asarray(all_cmc, dtype=np.float32).sum(0) / len(all_cmc)
    return cmc, float(np.mean(all_ap))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cmc_map_matches_naive(seed):
    rng = np.random.RandomState(seed)
    Q, G = 20, 80
    distmat = rng.rand(Q, G).astype(np.float32)
    q_pids = rng.randint(0, 10, Q)
    g_pids = rng.randint(0, 10, G)
    q_camids = rng.randint(0, 4, Q)
    g_camids = rng.randint(0, 4, G)
    cmc, mAP = cmc_map(distmat, q_pids, g_pids, q_camids, g_camids, max_rank=20)
    cmc_ref, map_ref = naive_eval(distmat, q_pids, g_pids, q_camids,
                                  g_camids, max_rank=20)
    np.testing.assert_allclose(cmc, cmc_ref, atol=1e-5)
    assert abs(mAP - map_ref) < 1e-5


def test_perfect_retrieval():
    # gallery identical to query: rank-1 = 100%, mAP = 100%
    rng = np.random.RandomState(3)
    feats = rng.randn(10, 16).astype(np.float32)
    distmat = np.asarray(euclidean_distmat(feats, feats))
    # protocol discards same (pid, camid): give gallery a different camid
    pids = np.arange(10)
    cmc, mAP = cmc_map(distmat, pids, pids, np.zeros(10), np.ones(10))
    assert cmc[0] == 1.0 and abs(mAP - 1.0) < 1e-6


def test_evaluator_end_to_end():
    rng = np.random.RandomState(4)
    # 5 ids, clusterable features
    centers = rng.randn(5, 32) * 10
    q = centers + 0.1 * rng.randn(5, 32)
    g = np.concatenate([centers + 0.1 * rng.randn(5, 32) for _ in range(3)])
    ev = R1mAPEvaluator(num_query=5)
    ev.update(np.concatenate([q, g]).astype(np.float32),
              np.concatenate([np.arange(5)] * 4),
              np.concatenate([np.zeros(5), np.ones(15)]))
    cmc, mAP, *_ = ev.compute()
    assert cmc[0] == 1.0
    assert mAP > 0.99


def test_reranking_improves_or_preserves_easy_case():
    rng = np.random.RandomState(5)
    centers = rng.randn(4, 16) * 5
    q = centers + 0.3 * rng.randn(4, 16)
    g = np.concatenate([centers + 0.3 * rng.randn(4, 16) for _ in range(5)])
    d = k_reciprocal_rerank(q.astype(np.float32), g.astype(np.float32),
                            k1=6, k2=3, lambda_value=0.3)
    assert d.shape == (4, 20)
    g_pids = np.tile(np.arange(4), 5)
    # nearest neighbor after re-ranking is the right identity
    nn = g_pids[np.argmin(d, axis=1)]
    np.testing.assert_array_equal(nn, np.arange(4))


def test_msvr_protocol():
    from editor_tpu.evals import cmc_map_msvr
    rng = np.random.RandomState(6)
    Q, G = 10, 40
    distmat = rng.rand(Q, G).astype(np.float32)
    q_pids = rng.randint(0, 5, Q)
    g_pids = rng.randint(0, 5, G)
    cams_q = rng.randint(0, 3, Q)
    cams_g = rng.randint(0, 3, G)
    sc_q = rng.randint(0, 4, Q)
    sc_g = rng.randint(0, 4, G)
    cmc, mAP = cmc_map_msvr(distmat, q_pids, g_pids, cams_q, cams_g, sc_q, sc_g)
    assert 0 <= mAP <= 1 and cmc.shape[0] == 40


def test_jax_reranking_matches_numpy():
    """Device-side fixed-k reranking == the reference-faithful numpy path."""
    from editor_tpu.evals.reranking_jax import k_reciprocal_rerank_jax
    rng = np.random.RandomState(7)
    centers = rng.randn(8, 16) * 5
    q = (centers[rng.randint(0, 8, 24)] + 0.4 * rng.randn(24, 16)).astype(np.float32)
    g = (centers[rng.randint(0, 8, 100)] + 0.4 * rng.randn(100, 16)).astype(np.float32)
    d_np = k_reciprocal_rerank(q, g, k1=10, k2=4, lambda_value=0.3)
    d_jx = k_reciprocal_rerank_jax(q, g, k1=10, k2=4, lambda_value=0.3)
    np.testing.assert_allclose(d_jx, d_np, atol=1e-5)


def test_sharded_cmc_map_matches_unsharded():
    """Gallery-sharded eval (SURVEY.md §5.7): sharding queries over the
    8-device mesh reproduces the single-device metrics exactly, including
    the Q-padding path."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from editor_tpu.evals.metrics import (cmc_map, euclidean_distmat,
                                          sharded_cmc_map)

    rng = np.random.RandomState(7)
    Q, G, D = 21, 65, 16  # Q deliberately not divisible by 8
    qf = rng.randn(Q, D).astype(np.float32)
    gf = rng.randn(G, D).astype(np.float32)
    q_pids = rng.randint(0, 9, Q)
    g_pids = rng.randint(0, 9, G)
    q_cams = rng.randint(0, 3, Q)
    g_cams = rng.randint(0, 3, G)

    dist = euclidean_distmat(jnp.asarray(qf), jnp.asarray(gf))
    cmc_ref, map_ref = cmc_map(dist, q_pids, g_pids, q_cams, g_cams)

    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))
    remove = ((g_pids[None, :] == q_pids[:, None])
              & (g_cams[None, :] == q_cams[:, None]))
    cmc_sh, map_sh = sharded_cmc_map(jnp.asarray(qf), jnp.asarray(gf),
                                     jnp.asarray(q_pids),
                                     jnp.asarray(g_pids),
                                     jnp.asarray(remove), mesh)
    np.testing.assert_allclose(cmc_sh, cmc_ref, atol=1e-6)
    np.testing.assert_allclose(map_sh, map_ref, atol=1e-6)


# ---------------------------------------------------------------------------
# property-based fuzz: the vectorized protocol == the per-query loop on
# arbitrary shapes/cardinalities (hypothesis; unique distances avoid
# argsort tie ambiguity between the two implementations)
# ---------------------------------------------------------------------------

from hypothesis import assume, given, settings, strategies as st  # noqa: E402


@settings(deadline=None, max_examples=40)
@given(q=st.integers(1, 12), g=st.integers(2, 60),
       npids=st.integers(1, 8), ncams=st.integers(1, 4),
       seed=st.integers(0, 2**31 - 1), rank=st.integers(1, 60))
def test_cmc_map_fuzz_matches_naive(q, g, npids, ncams, seed, rank):
    rng = np.random.RandomState(seed)
    distmat = (rng.permutation(q * g).reshape(q, g) / (q * g)
               ).astype(np.float32)
    q_pids = rng.randint(0, npids, q)
    g_pids = rng.randint(0, npids, g)
    q_camids = rng.randint(0, ncams, q)
    g_camids = rng.randint(0, ncams, g)
    # at least one query must keep a valid same-pid match after the
    # same-(pid,camid) discard — otherwise both implementations reject
    same = q_pids[:, None] == g_pids[None, :]
    removed = same & (q_camids[:, None] == g_camids[None, :])
    assume((same & ~removed).any())
    # CMC ranks past a query's kept-gallery length are undefined in the
    # reference protocol (its per-query rows would go ragged; real
    # galleries are always ≫ max_rank) — compare only well-defined ranks
    kept = (~removed).sum(axis=1)
    rank = min(rank, int(kept.min()))
    assume(rank >= 1)
    cmc, mAP = cmc_map(distmat, q_pids, g_pids, q_camids, g_camids,
                       max_rank=rank)
    cmc_ref, map_ref = naive_eval(distmat, q_pids, g_pids, q_camids,
                                  g_camids, max_rank=rank)
    np.testing.assert_allclose(cmc, cmc_ref, atol=1e-5)
    assert abs(mAP - map_ref) < 1e-5


def test_cmc_map_rejects_all_invalid_queries():
    # every query's only same-pid gallery entry shares its camid → the
    # protocol removes everything; reference would divide by zero, we raise
    distmat = np.asarray([[0.1, 0.9]], np.float32)
    with pytest.raises(RuntimeError):
        cmc_map(distmat, q_pids=np.asarray([1]), g_pids=np.asarray([1, 2]),
                q_camids=np.asarray([0]), g_camids=np.asarray([0, 0]))
