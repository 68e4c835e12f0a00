"""Expert-parallel MoE parity on the CPU mesh (EP — absent in reference,
SURVEY.md §2.2 parallelism checklist; editor_tpu/parallel/moe.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from editor_tpu.parallel.moe import (MoEParams, moe_ffn, moe_ffn_dense,
                                     moe_init)

D, F, E, K = 32, 64, 8, 2


def _mesh(S):
    return Mesh(np.asarray(jax.devices()[:S]), axis_names=("expert",))


def test_dense_moe_routes_and_mixes():
    params = moe_init(jax.random.PRNGKey(0), D, F, E)
    x = jax.random.normal(jax.random.PRNGKey(1), (64, D))
    y, aux = moe_ffn_dense(params, x, k=K)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()
    # a perfectly balanced router gives aux == 1; any router stays finite
    assert 0.0 < float(aux) < float(E)
    # with huge capacity nothing drops: output == gated sum of expert ffns
    y2, _ = moe_ffn_dense(params, x, k=K, capacity_factor=float(E))
    from editor_tpu.parallel.moe import _expert_ffn, _route
    gates, idx, _ = _route(params.router, x, K)
    ye = jax.vmap(_expert_ffn, in_axes=(0, 0, 0, 0, None))(
        params.w1, params.b1, params.w2, params.b2, x)  # [E, T, D]
    want = jnp.zeros_like(y2, jnp.float32)
    for j in range(K):
        sel = jax.nn.one_hot(idx[:, j], E, dtype=jnp.float32)  # [T, E]
        want = want + gates[:, j, None] * jnp.einsum("te,etd->td", sel, ye)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("S", [4, 8])
def test_expert_parallel_matches_per_shard_dense(S):
    """EP output == dense oracle applied independently to each token shard
    (capacity buffers are per shard, so that IS the contract)."""
    params = moe_init(jax.random.PRNGKey(2), D, F, E)
    T = 16 * S
    x = jax.random.normal(jax.random.PRNGKey(3), (T, D))
    mesh = _mesh(S)
    xs = jax.device_put(x, NamedSharding(mesh, P("expert", None)))
    ps = MoEParams(
        router=jax.device_put(params.router, NamedSharding(mesh, P())),
        w1=jax.device_put(params.w1, NamedSharding(mesh, P("expert"))),
        b1=jax.device_put(params.b1, NamedSharding(mesh, P("expert"))),
        w2=jax.device_put(params.w2, NamedSharding(mesh, P("expert"))),
        b2=jax.device_put(params.b2, NamedSharding(mesh, P("expert"))),
    )
    y, aux = jax.jit(lambda p, t: moe_ffn(p, t, mesh, k=K))(ps, xs)
    chunks, auxes = [], []
    for s in range(S):
        ys, ax = moe_ffn_dense(params, x[s * 16:(s + 1) * 16], k=K)
        chunks.append(np.asarray(ys))
        auxes.append(float(ax))
    np.testing.assert_allclose(np.asarray(y), np.concatenate(chunks),
                               atol=1e-5)
    np.testing.assert_allclose(float(aux), np.mean(auxes), rtol=1e-5)


def test_moe_validates_divisibility():
    params = moe_init(jax.random.PRNGKey(0), D, F, 6)  # 6 % 4 != 0
    mesh = _mesh(4)
    with pytest.raises(ValueError, match="not divisible"):
        moe_ffn(params, jnp.zeros((16, D)), mesh)
