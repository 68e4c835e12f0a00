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
        from jax import shard_map
        from functools import partial
        from editor_tpu.parallel.ring import _ring_shard
        spec = P("data", None, "seq", None)
        return shard_map(
            partial(_ring_shard, axis_name="seq", S=4,
                    scale=q.shape[-1] ** -0.5),
            mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
            check_vma=False)(a, b, c)

    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))
    got = jax.jit(fn)(qs, ks, vs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_ring_validates_divisibility():
    mesh = _seq_mesh(8)
    q, k, v = _qkv(N=129)  # 129 % 8 != 0
    with pytest.raises(ValueError, match="not divisible"):
        ring_attention(q, k, v, mesh)


# ---------------------------------------------------------------------------
# HMA masked sequence parallelism (VERDICT r2 task 2: the 387-token fusion
# attention runs seq-sharded with the -65504 mask algebra carried through
# the ring — reference semantics vit_pytorch.py:240-258)
# ---------------------------------------------------------------------------

def _masked_case(B=2, H=4, N=384, D=16, seed=5, frac=0.4):
    q, k, v = _qkv(B, H, N, D, seed)
    mask = (jax.random.uniform(jax.random.PRNGKey(seed + 1), (B, N))
            < frac).astype(jnp.float32)
    # HMA masks always keep the cls token of each tile
    mask = mask.at[:, 0].set(1.0)
    return q, k, v, mask


@pytest.mark.parametrize("seq", [4, 8])
def test_ring_masked_attention_matches_xla(seq):
    from editor_tpu.ops.masked_attention import _xla_masked_attention
    from editor_tpu.parallel.ring import ring_masked_attention

    q, k, v, mask = _masked_case()
    mesh = _seq_mesh(seq)
    ref = _xla_masked_attention(q, k, v, mask, q.shape[-1] ** -0.5, -65504.0)
    sh = NamedSharding(mesh, P(None, None, "seq", None))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))
    ms = jax.device_put(mask, NamedSharding(mesh, P(None, "seq")))
    got = jax.jit(lambda a, b, c, m: ring_masked_attention(
        a, b, c, m, mesh))(qs, ks, vs, ms)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_ring_masked_fully_masked_shard_is_finite():
    """A shard whose every key is masked (the worst case for the online
    recurrence: all its logits are the -65504 fill) must contribute exactly
    like the single-device reference — zero rows, no NaNs."""
    from editor_tpu.ops.masked_attention import _xla_masked_attention
    from editor_tpu.parallel.ring import ring_masked_attention

    q, k, v, mask = _masked_case(N=128, seed=7)
    # zero out the entire second quarter (one whole shard of a seq=4 mesh)
    mask = mask.at[:, 32:64].set(0.0)
    mesh = _seq_mesh(4)
    ref = _xla_masked_attention(q, k, v, mask, q.shape[-1] ** -0.5, -65504.0)
    got = jax.jit(lambda a, b, c, m: ring_masked_attention(
        a, b, c, m, mesh))(q, k, v, mask)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_ulysses_masked_attention_matches_xla():
    from editor_tpu.ops.masked_attention import _xla_masked_attention
    from editor_tpu.parallel.ring import ulysses_masked_attention

    q, k, v, mask = _masked_case(H=8, seed=9)
    mesh = _seq_mesh(8)
    ref = _xla_masked_attention(q, k, v, mask, q.shape[-1] ** -0.5, -65504.0)
    got = jax.jit(lambda a, b, c, m: ulysses_masked_attention(
        a, b, c, m, mesh))(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_fusion_block_seq_sharded_matches_local():
    """The REAL HMA fusion block (blockmask_apply) runs sequence-sharded:
    every masked attention inside goes through the masked ring schedule and
    the result matches the local run — SURVEY §7's SP demonstration on the
    fusion block, with gradients."""
    from editor_tpu.models.fusion import blockmask_apply, blockmask_init

    dim, P_patches, B = 48, 31, 2          # 1+P = 32 tokens, 3 tiles = 96
    params = blockmask_init(jax.random.PRNGKey(0), dim=dim, mlp_ratio=2.0)
    feats = [jax.random.normal(jax.random.PRNGKey(i + 1),
                               (B, 1 + P_patches, dim), jnp.float32)
             for i in range(3)]
    mask_p = (jax.random.uniform(jax.random.PRNGKey(9), (B, P_patches, 1))
              < 0.5).astype(jnp.float32)
    labels = jnp.asarray([0, 1])
    centers = {m: jnp.zeros((4, dim), jnp.float32)
               for m in ("rgb", "nir", "tir")}

    def run(params, seq_mesh=None):
        fused, ocfr, _, _ = blockmask_apply(
            params, feats, mask_p, centers, labels, num_heads=4,
            training=True, use_pallas=False, seq_mesh=seq_mesh)
        return fused, ocfr

    ref_fused, ref_ocfr = jax.jit(run)(params)
    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("seq",))
    got_fused, got_ocfr = jax.jit(
        lambda p: run(p, seq_mesh=mesh))(params)
    np.testing.assert_allclose(np.asarray(got_fused), np.asarray(ref_fused),
                               atol=2e-5)
    np.testing.assert_allclose(float(got_ocfr), float(ref_ocfr), rtol=1e-5)

    # gradients flow through the ring (training capability, not just fwd)
    def loss(p, seq_mesh):
        fused, ocfr = run(p, seq_mesh)
        return jnp.mean(jnp.square(fused)) + ocfr

    g_ref = jax.grad(lambda p: loss(p, None))(params)
    g_got = jax.grad(lambda p: loss(p, mesh))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)
