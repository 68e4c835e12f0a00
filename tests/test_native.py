import numpy as np
import pytest


def test_native_reranking_matches_numpy():
    from editor_tpu.native import load_native, k_reciprocal_rerank_native
    if load_native() is None:
        pytest.skip("no C++ toolchain available")
    from editor_tpu.evals.reranking import k_reciprocal_rerank

    rng = np.random.RandomState(0)
    centers = rng.randn(10, 16) * 5
    q = (centers[rng.randint(0, 10, 30)] + 0.5 * rng.randn(30, 16)).astype(np.float32)
    g = (centers[rng.randint(0, 10, 120)] + 0.5 * rng.randn(120, 16)).astype(np.float32)
    d_py = k_reciprocal_rerank(q, g, k1=10, k2=4, lambda_value=0.3)
    d_cc = k_reciprocal_rerank_native(q, g, k1=10, k2=4, lambda_value=0.3)
    np.testing.assert_allclose(d_cc, d_py, atol=1e-5)


def test_rerank_auto_fallback():
    from editor_tpu.native import rerank_auto
    rng = np.random.RandomState(1)
    q = rng.randn(8, 8).astype(np.float32)
    g = rng.randn(30, 8).astype(np.float32)
    d = rerank_auto(q, g, k1=5, k2=2, lambda_value=0.3)
    assert d.shape == (8, 30)
    assert np.isfinite(d).all()
