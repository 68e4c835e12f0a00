"""Pipeline library parity tail (round-4 verdict missing #2 / task 6):
cross-stage skip tensors (reference pipeline/sync/skip/skippable.py:52,
portal.py:29) and DeferredBatchNorm (reference pipeline/sync/
batchnorm.py:23), both re-designed for the functional ppermute pipeline
(editor_tpu/parallel/pipeline.py, deferred_bn.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax
from jax.sharding import Mesh

from editor_tpu.parallel.deferred_bn import (bn_acc_init, bn_params_init,
                                             deferred_bn_apply,
                                             deferred_bn_commit)
from editor_tpu.parallel.pipeline import (init_skips, pipeline_apply, pop,
                                          stash)


def _stage_mesh(S):
    return Mesh(np.asarray(jax.devices()[:S]).reshape(S), ("stage",))


# ---------------------------------------------------------------------------
# skip tensors
# ---------------------------------------------------------------------------

def test_skip_long_residual_matches_sequential():
    """Stage 0 stashes its output; stage 3 pops it and adds (a long
    residual across two intermediate stages — the reference's
    ``yield stash('1to3', x)`` / ``skip = yield pop('1to3')`` example,
    skippable.py:260-271). Values AND grads must match the single-device
    oracle — autograd through stash/pop is the scanned carry, no
    Fork/Join needed."""
    rng = np.random.RandomState(7)
    S, D, B = 4, 12, 16
    Ws = jnp.asarray(rng.randn(S, D, D).astype(np.float32) * 0.3)
    x = jnp.asarray(rng.randn(B, D).astype(np.float32))
    mesh = _stage_mesh(S)

    def stage_fn(w, xs):
        h, skips = xs
        out = jnp.tanh(h @ w)
        s = lax.axis_index("stage")
        # stage 0 stashes its OUTPUT (conditional by value: the pipeline is
        # SPMD, every stage runs the same program)
        skips = stash(skips, "s0to3",
                      jnp.where(s == 0, out, skips["s0to3"]))
        val, popped = pop(skips, "s0to3")
        use = s == S - 1
        out = jnp.where(use, out + val, out)
        skips = jax.tree_util.tree_map(
            lambda a, b: jnp.where(use, a, b), popped, skips)
        return out, skips

    def run(Ws_):
        xs = (x, init_skips(B, {"s0to3": jnp.zeros((D,), jnp.float32)}))
        out, _ = pipeline_apply(stage_fn, Ws_, xs, mesh,
                                num_microbatches=4, axis_name="stage")
        return out

    def ref(Ws_):
        h = x
        stashed = None
        for i in range(S):
            h = jnp.tanh(h @ Ws_[i])
            if i == 0:
                stashed = h
            if i == S - 1:
                h = h + stashed
        return h

    np.testing.assert_allclose(np.asarray(run(Ws)), np.asarray(ref(Ws)),
                               atol=1e-5)

    loss = lambda f: lambda W: jnp.mean(jnp.square(f(W)))
    g_pipe = jax.grad(loss(run))(Ws)
    g_ref = jax.grad(loss(ref))(Ws)
    np.testing.assert_allclose(np.asarray(g_pipe), np.asarray(g_ref),
                               atol=1e-5)


def test_skip_slot_errors():
    skips = init_skips(4, {"a": jnp.zeros((3,))})
    with pytest.raises(KeyError):
        stash(skips, "missing", jnp.zeros((4, 3)))
    with pytest.raises(ValueError):
        stash(skips, "a", jnp.zeros((4, 5)))
    with pytest.raises(KeyError):
        pop(skips, "missing")
    val, out = pop(stash(skips, "a", jnp.ones((4, 3))), "a")
    assert float(val.sum()) == 12.0 and float(out["a"].sum()) == 0.0


# ---------------------------------------------------------------------------
# per-stage carried state + valid mask
# ---------------------------------------------------------------------------

def test_stage_state_counts_only_valid_ticks():
    """The stage_state carry and the ``valid`` flag: counting valid ticks
    per stage must give exactly num_microbatches everywhere (warm-up and
    drain bubbles masked), and the activation output is unchanged."""
    rng = np.random.RandomState(8)
    S, D, M = 4, 8, 3
    Ws = jnp.asarray(rng.randn(S, D, D).astype(np.float32) * 0.2)
    x = jnp.asarray(rng.randn(6, D).astype(np.float32))
    mesh = _stage_mesh(S)

    def stage_fn(w, h, st, valid):
        return jnp.tanh(h @ w), {
            "ticks": st["ticks"] + 1,
            "valid": st["valid"] + jnp.asarray(valid, jnp.int32)}

    state = {"ticks": jnp.zeros((S,), jnp.int32),
             "valid": jnp.zeros((S,), jnp.int32)}
    out, st = pipeline_apply(stage_fn, Ws, x, mesh, num_microbatches=M,
                             axis_name="stage", stage_state=state)
    ref = x
    for i in range(S):
        ref = jnp.tanh(ref @ Ws[i])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    # every stage ran all M + S - 1 ticks but only M were real data
    assert list(np.asarray(st["ticks"])) == [M + S - 1] * S
    assert list(np.asarray(st["valid"])) == [M] * S


# ---------------------------------------------------------------------------
# DeferredBatchNorm
# ---------------------------------------------------------------------------

def _load_reference_dbn():
    """Import the ACTUAL reference DeferredBatchNorm (pure CPU torch)."""
    import importlib.util
    import sys
    import types

    if "ref_dbn" in sys.modules:
        return sys.modules["ref_dbn"].DeferredBatchNorm
    # batchnorm.py only needs `is_recomputing` from its sibling; stub the
    # package chain so the relative import resolves without executing the
    # reference's heavier pipeline modules
    pkg = types.ModuleType("refpipe")
    pkg.__path__ = ["/root/reference/distributed/pipeline/sync"]
    sys.modules["refpipe"] = pkg
    ckpt = types.ModuleType("refpipe.checkpoint")
    ckpt.is_recomputing = lambda: False
    sys.modules["refpipe.checkpoint"] = ckpt
    spec = importlib.util.spec_from_file_location(
        "refpipe.batchnorm",
        "/root/reference/distributed/pipeline/sync/batchnorm.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["refpipe.batchnorm"] = mod
    spec.loader.exec_module(mod)
    sys.modules["ref_dbn"] = mod
    return mod.DeferredBatchNorm


@pytest.mark.parametrize("momentum", [0.1, None])
def test_deferred_bn_value_parity_vs_torch_reference(momentum):
    """Microbatch outputs AND post-mini-batch running statistics must be
    value-identical to the reference DeferredBatchNorm
    (pipeline/sync/batchnorm.py:56-132) driven chunk by chunk."""
    torch = pytest.importorskip("torch")
    DeferredBatchNorm = _load_reference_dbn()

    rng = np.random.RandomState(9)
    C_feat, M, mb, H, W = 5, 4, 3, 2, 3
    chunks = [rng.randn(mb, C_feat, H, W).astype(np.float32) * 2 + 1
              for _ in range(M)]

    ref = DeferredBatchNorm(C_feat, momentum=momentum, chunks=M)
    ref.train()
    with torch.no_grad():
        ref.weight.mul_(0).add_(torch.tensor([1.0, 2.0, 0.5, 1.5, 3.0]))
        ref.bias.add_(torch.tensor([0.1, -0.2, 0.3, 0.0, -0.1]))
    ref_outs = [ref(torch.from_numpy(c)).detach().numpy() for c in chunks]

    params = bn_params_init(C_feat)
    params["gamma"] = jnp.asarray([1.0, 2.0, 0.5, 1.5, 3.0])
    params["beta"] = jnp.asarray([0.1, -0.2, 0.3, 0.0, -0.1])
    acc = bn_acc_init(C_feat)
    outs = []
    for c in chunks:
        # channel-first torch chunk -> channel-last JAX
        y, acc = deferred_bn_apply(params, jnp.asarray(
            np.transpose(c, (0, 2, 3, 1))), acc, valid=True)
        outs.append(np.transpose(np.asarray(y), (0, 3, 1, 2)))
    params = deferred_bn_commit(params, acc, momentum=momentum)

    for got, want in zip(outs, ref_outs):
        np.testing.assert_allclose(got, want, atol=1e-5)
    np.testing.assert_allclose(np.asarray(params["running_mean"]),
                               ref.running_mean.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(params["running_var"]),
                               ref.running_var.numpy(), atol=1e-5)
    assert int(params["num_batches_tracked"]) == int(
        ref.num_batches_tracked)


def test_deferred_bn_inside_pipeline_stage():
    """BN inside a microbatched pipeline stage: per-microbatch outputs
    match the sequential per-chunk oracle, and the committed running stats
    are the FULL-mini-batch moments (the whole point of deferral —
    microbatch-stats pollution of the running estimates is what the
    reference class exists to prevent)."""
    rng = np.random.RandomState(10)
    S, D, B, M = 2, 6, 12, 4
    Ws = jnp.asarray(rng.randn(S, D, D).astype(np.float32) * 0.4)
    x = jnp.asarray((rng.randn(B, D) * 3 + 2).astype(np.float32))
    mesh = _stage_mesh(S)
    bn = bn_params_init(D)
    bn_stacked = jax.tree_util.tree_map(
        lambda l: jnp.broadcast_to(l, (S,) + l.shape), bn)

    def stage_fn(params, h, acc, valid):
        w, bnp = params
        h, acc = deferred_bn_apply(bnp, h, acc, valid)
        return jnp.tanh(h @ w), acc

    acc0 = jax.tree_util.tree_map(
        lambda l: jnp.broadcast_to(l, (S,) + l.shape), bn_acc_init(D))
    out, accs = pipeline_apply(stage_fn, (Ws, bn_stacked), x, mesh,
                               num_microbatches=M, axis_name="stage",
                               stage_state=acc0)

    # sequential oracle: same per-microbatch normalization chunk by chunk
    mb = B // M
    ref_chunks = []
    stage_inputs = [[] for _ in range(S)]
    for i in range(M):
        h = x[i * mb:(i + 1) * mb]
        for s in range(S):
            stage_inputs[s].append(np.asarray(h))
            hy, _ = deferred_bn_apply(bn, h, bn_acc_init(D), valid=True)
            h = jnp.tanh(hy @ Ws[s])
        ref_chunks.append(np.asarray(h))
    np.testing.assert_allclose(np.asarray(out), np.concatenate(ref_chunks),
                               atol=1e-5)

    # stage 0's accumulator == full-batch moments of x
    new_bn = deferred_bn_commit(
        bn, jax.tree_util.tree_map(lambda l: l[0], accs))
    full = np.concatenate(stage_inputs[0])
    want_mean = 0.1 * full.mean(axis=0)  # (1-m)*0 + m*mean
    want_var = 0.9 * 1.0 + 0.1 * full.var(axis=0)
    np.testing.assert_allclose(np.asarray(new_bn["running_mean"]),
                               want_mean, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_bn["running_var"]),
                               want_var, atol=1e-4)
