"""Sequence-parallel attention (ring + Ulysses) parity on the CPU mesh.

The reference has no SP/CP implementation (SURVEY.md §2.2 parallelism
checklist); these validate the TPU-native demonstrations in
editor_tpu/parallel/ring.py against single-device full attention.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from editor_tpu.parallel.ring import (_full_attention, ring_attention,
                                      ulysses_attention)


def _seq_mesh(seq: int, data: int = 1) -> Mesh:
    devs = np.asarray(jax.devices()[:data * seq]).reshape(data, seq)
    return Mesh(devs, axis_names=("data", "seq"))


def _qkv(B=2, H=8, N=384, D=16, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    shape = (B, H, N, D)
    return tuple(jax.random.normal(k, shape, jnp.float32) for k in ks)


@pytest.mark.parametrize("seq", [4, 8])
def test_ring_attention_matches_full(seq):
    q, k, v = _qkv()
    mesh = _seq_mesh(seq)
    ref = _full_attention(q, k, v, q.shape[-1] ** -0.5)
    sh = NamedSharding(mesh, P(None, None, "seq", None))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))
    got = jax.jit(lambda a, b, c: ring_attention(a, b, c, mesh))(qs, ks, vs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_ring_attention_extreme_logits_stable():
    """The online-softmax recurrence must survive |logit| >> 88 (the -inf
    seed and exp(m_old - m_new) corrections keep everything finite)."""
    q, k, v = _qkv(seed=3)
    q = q * 40.0
    mesh = _seq_mesh(4)
    ref = _full_attention(q, k, v, q.shape[-1] ** -0.5)
    got = jax.jit(lambda a, b, c: ring_attention(a, b, c, mesh))(q, k, v)
    assert np.isfinite(np.asarray(got)).all()
    # fp32 rounding at |logit| ~ 10^3 leaves ~1e-4 relative wiggle
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_ulysses_attention_matches_full():
    q, k, v = _qkv(seed=1)
    mesh = _seq_mesh(8)
    ref = _full_attention(q, k, v, q.shape[-1] ** -0.5)
    got = jax.jit(lambda a, b, c: ulysses_attention(a, b, c, mesh))(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_ring_under_data_x_seq_mesh():
    """2D (data=2, seq=4) mesh: batch and sequence sharded simultaneously —
    the composition the scaling playbook actually deploys."""
    q, k, v = _qkv(B=4, seed=2)
    mesh = _seq_mesh(4, data=2)
    ref = _full_attention(q, k, v, q.shape[-1] ** -0.5)
    sh = NamedSharding(mesh, P("data", None, "seq", None))

    def fn(a, b, c):
        from jax.experimental.shard_map import shard_map
        from functools import partial
        from editor_tpu.parallel.ring import _ring_shard
        spec = P("data", None, "seq", None)
        return shard_map(
            partial(_ring_shard, axis_name="seq", S=4,
                    scale=q.shape[-1] ** -0.5),
            mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
            check_rep=False)(a, b, c)

    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))
    got = jax.jit(fn)(qs, ks, vs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_ring_validates_divisibility():
    mesh = _seq_mesh(8)
    q, k, v = _qkv(N=129)  # 129 % 8 != 0
    with pytest.raises(ValueError, match="not divisible"):
        ring_attention(q, k, v, mesh)
