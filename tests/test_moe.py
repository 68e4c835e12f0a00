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


def test_fusion_block_moe_parity_expert_mesh():
    """The REAL HMA fusion block with its joint MLP as a GShard MoE
    (models/fusion.blockmask_moe_init), experts+tokens sharded over an
    8-device 'expert' mesh, matches the single-device per-shard oracle
    (moe_shards emulation) in loss AND gradients."""
    from editor_tpu.models.fusion import blockmask_apply, blockmask_moe_init

    S = 8
    mesh = _mesh(S)
    dim, Pp, B = 48, 4 * S - 1, 2   # B*3*(1+Pp) = 24*S tokens, divisible
    rng = np.random.RandomState(0)
    params = blockmask_moe_init(jax.random.PRNGKey(3), dim=dim,
                                mlp_ratio=2.0, num_experts=2 * S)
    feats = [jnp.asarray(rng.randn(B, 1 + Pp, dim).astype(np.float32))
             for _ in range(3)]
    mask = jnp.asarray((rng.rand(B, Pp, 1) < 0.5).astype(np.float32))
    labels = jnp.asarray([0, 1])
    centers = {m: jnp.zeros((4, dim), jnp.float32)
               for m in ("rgb", "nir", "tir")}

    def loss(p, moe_mesh, moe_shards):
        fused, ocfr, _, aux = blockmask_apply(
            p, feats, mask, centers, labels, num_heads=4, training=True,
            use_pallas=False, moe_mesh=moe_mesh, moe_shards=moe_shards)
        return jnp.mean(jnp.square(fused)) + ocfr + 0.01 * aux

    ref, g_ref = jax.value_and_grad(lambda p: loss(p, None, S))(params)
    got, g_got = jax.value_and_grad(lambda p: loss(p, mesh, 1))(params)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_got),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def test_editor_moe_variant_trains():
    """EDITOR with MODEL.MOE_EXPERTS > 0: the fusion MLP becomes a routed
    expert bank; one train step runs, the load-balance aux reaches the
    total loss, and the step decreases the loss over a few iterations."""
    import dataclasses

    from editor_tpu.config import Config
    from editor_tpu.engine import build_train_step, make_train_state
    from editor_tpu.losses import make_loss
    from editor_tpu.models import EditorConfig, ViTConfig
    from editor_tpu.solver import make_optimizer, make_scheduler

    vit = ViTConfig(img_size=(64, 32), patch_size=16, stride_size=(16, 16),
                    embed_dim=96, depth=2, num_heads=4, mlp_ratio=2.0,
                    camera=4, drop_path_rate=0.0)
    ecfg = EditorConfig(num_classes=4, vit=vit, head_keep=2,
                        frequency_keep=3, use_pallas=False, moe_experts=4)
    cfg = Config()
    rng = np.random.RandomState(0)
    batch = {
        "RGB": jnp.asarray(rng.randn(8, 64, 32, 3), jnp.float32),
        "NI": jnp.asarray(rng.randn(8, 64, 32, 3), jnp.float32),
        "TI": jnp.asarray(rng.randn(8, 64, 32, 3), jnp.float32),
        "pid": jnp.asarray(np.repeat(np.arange(4), 2)),
        "camid": jnp.zeros((8,), jnp.int32),
    }
    from editor_tpu.models.editor import editor_init
    p, _ = editor_init(jax.random.PRNGKey(0), ecfg)
    assert "moe_mlp" in p["FUSE_block"] and "mlp" not in p["FUSE_block"]
    opt = make_optimizer(cfg, p)
    state = make_train_state(jax.random.PRNGKey(0), ecfg, opt)
    step = build_train_step(ecfg, opt, make_loss(cfg, 4),
                            make_scheduler(cfg), cfg.SOLVER.BASE_LR,
                            compute_dtype=jnp.float32, donate=False)
    losses = []
    for _ in range(4):
        state, metrics = step(state, batch, jnp.asarray(15))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

    # dense config is unaffected: same call path returns a dense block
    dense = dataclasses.replace(ecfg, moe_experts=0)
    pd, _ = editor_init(jax.random.PRNGKey(0), dense)
    assert "mlp" in pd["FUSE_block"] and "moe_mlp" not in pd["FUSE_block"]
