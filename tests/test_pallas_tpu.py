"""TPU-only parity tests for the Pallas kernels vs their XLA oracles.

Skipped on CPU runs (the default suite); executed when the suite runs on a
host with a real TPU (e.g. the bench chip). Tolerances reflect bf16 operand
rounding — the kernels accumulate in fp32.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

on_tpu = jax.default_backend() == "tpu"
pytestmark = pytest.mark.skipif(not on_tpu, reason="needs a TPU backend")

H, C = 12, 768
SCALE = (C // H) ** -0.5


def _rand(shape, seed):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.bfloat16)


def test_attention_from_qkv_matches_xla():
    from editor_tpu.ops.fused_attention import (_pallas_attention_qkv,
                                                _xla_attention_qkv)
    qkv = _rand((8, 129, 3 * C), 0)
    ref = _xla_attention_qkv(qkv, H, SCALE, with_probs=False)
    got = _pallas_attention_qkv(qkv, H, SCALE, with_probs=False)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), atol=2e-2)


def test_attention_probs_split_matches_xla():
    from editor_tpu.ops.fused_attention import (_pallas_attention_qkv,
                                                _xla_attention_qkv)
    qkv = _rand((8, 129, 3 * C), 1)
    _, (rpp, rpc) = _xla_attention_qkv(qkv, H, SCALE, with_probs=True)
    _, (gpp, gpc) = _pallas_attention_qkv(qkv, H, SCALE, with_probs=True)
    np.testing.assert_allclose(np.asarray(gpp, np.float32),
                               np.asarray(rpp, np.float32), atol=1e-2)
    np.testing.assert_allclose(np.asarray(gpc, np.float32),
                               np.asarray(rpc, np.float32), atol=1e-2)


def test_attention_extreme_logits_finite_and_correct():
    """Row-max stabilization regression: |logits| in the thousands must not
    overflow fp32 exp (the XLA softmax oracle is stabilized; the kernels
    must match it, not NaN)."""
    from editor_tpu.ops.fused_attention import (_pallas_attention_qkv,
                                                _pallas_attention_qkv_bwd,
                                                _xla_attention_qkv)
    qkv = (_rand((4, 129, 3 * C), 30) * 30.0).astype(jnp.bfloat16)
    ref = _xla_attention_qkv(qkv, H, SCALE, with_probs=False)
    got = _pallas_attention_qkv(qkv, H, SCALE, with_probs=False)
    assert np.isfinite(np.asarray(got, np.float32)).all()
    # outputs are O(|v|) = O(30/ulp-of-bf16-at-64 = 0.5): compare scaled
    sc = max(float(jnp.max(jnp.abs(ref).astype(jnp.float32))), 1e-6)
    np.testing.assert_allclose(np.asarray(got, np.float32) / sc,
                               np.asarray(ref, np.float32) / sc, atol=1e-2)
    g = _rand((4, 129, C), 31)
    _, vjp = jax.vjp(
        lambda t: _xla_attention_qkv(t, H, SCALE, with_probs=False),
        qkv.astype(jnp.float32))
    (refg,) = vjp(g.astype(jnp.float32))
    gotg = _pallas_attention_qkv_bwd(qkv, g, H, SCALE)
    assert np.isfinite(np.asarray(gotg, np.float32)).all()
    sc = max(float(jnp.max(jnp.abs(refg))), 1e-6)
    np.testing.assert_allclose(np.asarray(gotg, np.float32) / sc,
                               np.asarray(refg) / sc, atol=1e-2)


def test_attention_bwd_matches_xla_vjp():
    from editor_tpu.ops.fused_attention import (_pallas_attention_qkv_bwd,
                                                _xla_attention_qkv)
    qkv = _rand((8, 129, 3 * C), 2)
    g = _rand((8, 129, C), 3)
    _, vjp = jax.vjp(
        lambda t: _xla_attention_qkv(t, H, SCALE, with_probs=False),
        qkv.astype(jnp.float32))
    (ref,) = vjp(g.astype(jnp.float32))
    got = _pallas_attention_qkv_bwd(qkv, g, H, SCALE)
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(np.asarray(got, np.float32) / scale,
                               np.asarray(ref) / scale, atol=1e-2)


@pytest.mark.parametrize("N", [129, 387])
def test_masked_attention_fwd_bwd_match_xla(N):
    from editor_tpu.ops.masked_attention import (_pallas_masked_from_qkv,
                                                 _pallas_masked_qkv_bwd,
                                                 _xla_masked_from_qkv)
    tile = 129
    qkv = _rand((4, N, 3 * C), 4)
    g = _rand((4, N, C), 5)
    m = (jax.random.uniform(jax.random.PRNGKey(6), (4, N)) < 0.1)
    m = (m | (jnp.arange(N) % tile == 0)[None, :]).astype(jnp.float32)
    ref = _xla_masked_from_qkv(qkv, m, H, SCALE, -65504.0)
    got = _pallas_masked_from_qkv(qkv, m, H, SCALE, -65504.0, tile)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), atol=2e-2)
    _, vjp = jax.vjp(
        lambda t: _xla_masked_from_qkv(t, m, H, SCALE, -65504.0),
        qkv.astype(jnp.float32))
    (refg,) = vjp(g.astype(jnp.float32))
    gotg = _pallas_masked_qkv_bwd(qkv, m, g, H, SCALE, -65504.0, tile)
    scale = float(jnp.max(jnp.abs(refg)))
    np.testing.assert_allclose(np.asarray(gotg, np.float32) / scale,
                               np.asarray(refg) / scale, atol=1e-2)


@pytest.mark.parametrize("N", [88, 264])
def test_masked_attention_full_kernel_matches_xla(N):
    """Tile-free full-logits kernels used for COMPACT_TAIL sequences
    (N = 1+keep per modality / M·(1+keep) joint — models/editor.py)."""
    from editor_tpu.ops.masked_attention import (_pallas_masked_full,
                                                 _pallas_masked_full_bwd,
                                                 _xla_masked_from_qkv)
    qkv = _rand((8, N, 3 * C), 7)
    g = _rand((8, N, C), 8)
    m = (jax.random.uniform(jax.random.PRNGKey(9), (8, N)) < 0.5)
    m = (m | (jnp.arange(N) % 88 == 0)[None, :]).astype(jnp.float32)
    ref = _xla_masked_from_qkv(qkv, m, H, SCALE, -65504.0)
    got = _pallas_masked_full(qkv, m, H, SCALE, -65504.0)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), atol=2e-2)
    _, vjp = jax.vjp(
        lambda t: _xla_masked_from_qkv(t, m, H, SCALE, -65504.0),
        qkv.astype(jnp.float32))
    (refg,) = vjp(g.astype(jnp.float32))
    gotg = _pallas_masked_full_bwd(qkv, m, g, H, SCALE, -65504.0)
    scale = float(jnp.max(jnp.abs(refg)))
    np.testing.assert_allclose(np.asarray(gotg, np.float32) / scale,
                               np.asarray(refg) / scale, atol=1e-2)


def test_rollout_chain_matches_full_chain():
    from editor_tpu.ops.rollout import (rollout_from_probs,
                                        rollout_from_split_probs)
    L, B, N = 4, 4, 129
    logits = jax.random.normal(jax.random.PRNGKey(7), (L, B, H, N, N))
    probs = jax.nn.softmax(logits, -1).astype(jnp.bfloat16)
    full = rollout_from_probs(probs.astype(jnp.float32))
    split = rollout_from_split_probs(probs[..., 1:], probs[..., 0])
    np.testing.assert_allclose(np.asarray(split), np.asarray(full),
                               atol=5e-3)


def test_kernel_probs_feed_rollout_real_contract():
    """End-to-end probs contract: the attention kernel's split spill fed
    through the Pallas rollout chain must equal the normalized full-map
    chain oracle."""
    from editor_tpu.ops.fused_attention import (_xla_attention_qkv,
                                                attention_from_qkv_probs)
    from editor_tpu.ops.rollout import (rollout_from_probs,
                                        rollout_from_split_probs)
    L = 3
    qkvs = [_rand((4, 129, 3 * C), 20 + i) for i in range(L)]
    fulls = []
    for qkv in qkvs:
        _, (pp, pc) = _xla_attention_qkv(qkv, H, SCALE, with_probs=True)
        fulls.append(jnp.concatenate(
            [pc[..., None], pp], -1).astype(jnp.float32))
    full = rollout_from_probs(jnp.stack(fulls))
    pairs = [attention_from_qkv_probs(qkv, H, SCALE)[1] for qkv in qkvs]
    split = rollout_from_split_probs(
        jnp.stack([t[0] for t in pairs]),
        jnp.stack([t[1] for t in pairs]))
    np.testing.assert_allclose(np.asarray(split), np.asarray(full),
                               atol=7e-3)


def test_masked_attention_extreme_logits_finite(N=264):
    """Stabilization regression for the masked kernels (fwd + bwd)."""
    from editor_tpu.ops.masked_attention import (_pallas_masked_full,
                                                 _pallas_masked_full_bwd,
                                                 _xla_masked_from_qkv)
    qkv = (_rand((4, N, 3 * C), 40) * 30.0).astype(jnp.bfloat16)
    g = _rand((4, N, C), 41)
    m = (jax.random.uniform(jax.random.PRNGKey(42), (4, N)) < 0.5)
    m = (m | (jnp.arange(N) % 88 == 0)[None, :]).astype(jnp.float32)
    ref = _xla_masked_from_qkv(qkv, m, H, SCALE, -65504.0)
    got = _pallas_masked_full(qkv, m, H, SCALE, -65504.0)
    assert np.isfinite(np.asarray(got, np.float32)).all()
    # outputs are O(|v|) = O(30): bf16 ulp at 64 is 0.5 — compare scaled
    sc = max(float(jnp.max(jnp.abs(ref).astype(jnp.float32))), 1e-6)
    np.testing.assert_allclose(np.asarray(got, np.float32) / sc,
                               np.asarray(ref, np.float32) / sc, atol=1e-2)
    gotg = _pallas_masked_full_bwd(qkv, m, g, H, SCALE, -65504.0)
    assert np.isfinite(np.asarray(gotg, np.float32)).all()


def test_qkv_tp_permutation_algebra_on_kernel():
    """TP permutation algebra ON THE TPU KERNEL, single chip (round-2
    verdict weak #6): the shard-major qkv column permutation
    (parallel/tp.qkv_tp_permutation) must make each contiguous model-shard a
    self-contained [q|k|v] block whose UNCHANGED Pallas attention run with
    H/tp local heads concatenates to the full-head result. The CPU suite can
    only exercise this via the XLA fallback; this covers the Pallas path."""
    from editor_tpu.ops.fused_attention import _pallas_attention_qkv
    from editor_tpu.parallel.tp import qkv_tp_permutation

    B, N, D = 4, 129, C // H
    x = _rand((B, N, C), 10).astype(jnp.float32)
    w = _rand((C, 3 * C), 11).astype(jnp.float32) * 0.05
    b = _rand((3 * C,), 12).astype(jnp.float32) * 0.05

    full = _pallas_attention_qkv(
        (x @ w + b).astype(jnp.bfloat16), H, SCALE, with_probs=False)

    for tp in (2, 4):
        perm = qkv_tp_permutation(H, D, tp)
        wp, bp = w[:, perm], b[perm]
        width = 3 * C // tp
        outs = []
        for s in range(tp):
            qkv_s = (x @ wp[:, s * width:(s + 1) * width]
                     + bp[s * width:(s + 1) * width]).astype(jnp.bfloat16)
            outs.append(_pallas_attention_qkv(qkv_s, H // tp, SCALE,
                                              with_probs=False))
        got = jnp.concatenate(outs, axis=-1)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(full, np.float32),
                                   atol=2e-2, rtol=2e-2, err_msg=f"tp={tp}")
