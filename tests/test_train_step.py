import jax
import jax.numpy as jnp
import numpy as np
import pytest

from editor_tpu.config import Config
from editor_tpu.engine import build_train_step, make_train_state
from editor_tpu.losses import make_loss
from editor_tpu.models import EditorConfig, ViTConfig
from editor_tpu.parallel import make_mesh, shard_batch
from editor_tpu.solver import make_optimizer, make_scheduler
from editor_tpu.solver.schedule import cosine_lr_schedule


def tiny_setup(al=False, batch=8):
    vit = ViTConfig(img_size=(64, 32), patch_size=16, stride_size=(16, 16),
                    embed_dim=96, depth=2, num_heads=4, mlp_ratio=2.0,
                    camera=4, drop_path_rate=0.0)
    ecfg = EditorConfig(num_classes=4, vit=vit, head_keep=2, frequency_keep=3,
                        al=al, use_pallas=False)
    cfg = Config()
    rng = np.random.RandomState(0)
    batch_data = {
        "RGB": jnp.asarray(rng.randn(batch, 64, 32, 3), jnp.float32),
        "NI": jnp.asarray(rng.randn(batch, 64, 32, 3), jnp.float32),
        "TI": jnp.asarray(rng.randn(batch, 64, 32, 3), jnp.float32),
        "pid": jnp.asarray(np.repeat(np.arange(4), batch // 4)),
        "camid": jnp.zeros((batch,), jnp.int32),
    }
    return cfg, ecfg, batch_data


@pytest.mark.parametrize("al", [False, True])
def test_train_step_decreases_loss(al):
    cfg, ecfg, batch = tiny_setup(al=al)
    from editor_tpu.models import editor_init  # noqa
    loss_func = make_loss(cfg, ecfg.num_classes)
    lr_fn = make_scheduler(cfg)
    params0 = None
    opt = None
    from editor_tpu.models.editor import editor_init as ei
    p, _ = ei(jax.random.PRNGKey(0), ecfg)
    opt = make_optimizer(cfg, p)
    state = make_train_state(jax.random.PRNGKey(0), ecfg, opt)
    step = build_train_step(ecfg, opt, loss_func, lr_fn, cfg.SOLVER.BASE_LR,
                            compute_dtype=jnp.float32, donate=False)
    losses = []
    epoch = jnp.asarray(15)  # past warmup: full base lr
    for _ in range(5):
        state, metrics = step(state, batch, epoch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 5


def test_schedule_matches_timm_semantics():
    # spot values: warmup ramp then cosine (cosine_lr.py:67-94 with the
    # factory args from scheduler_factory.py:15-29)
    base, epochs, warm = 0.008, 60, 10
    lr0 = float(cosine_lr_schedule(0, base, epochs, 0.001 * base, warm, 0.01 * base))
    assert abs(lr0 - 0.01 * base) < 1e-9
    lr_mid_warm = float(cosine_lr_schedule(5, base, epochs, 0.001 * base, warm,
                                           0.01 * base))
    expected = 0.01 * base + 5 * (base - 0.01 * base) / warm
    assert abs(lr_mid_warm - expected) < 1e-9
    lr_at_T = float(cosine_lr_schedule(60, base, epochs, 0.001 * base, warm,
                                       0.01 * base))
    assert abs(lr_at_T - 0.001 * base) < 1e-9  # past cycle_limit → lr_min
    lr_30 = float(cosine_lr_schedule(30, base, epochs, 0.001 * base, warm,
                                     0.01 * base))
    import math
    exp30 = 0.001 * base + 0.5 * (base - 0.001 * base) * (1 + math.cos(math.pi * 30 / 60))
    assert abs(lr_30 - exp30) < 1e-9


def test_optimizer_group_labels():
    from editor_tpu.models.editor import editor_init
    from editor_tpu.solver import param_group_labels
    _, ecfg, _ = tiny_setup()[0], tiny_setup()[1], None
    cfg, ecfg, _ = tiny_setup()
    p, _ = editor_init(jax.random.PRNGKey(0), ecfg)
    labels = param_group_labels(p)
    flat = jax.tree_util.tree_leaves_with_path(labels)
    lbls = {jax.tree_util.keystr(k): v for k, v in flat}
    assert lbls["['BACKBONE']['fc']['w']"] == "frozen"
    assert lbls["['BACKBONE']['fc']['b']"] == "frozen"
    assert lbls["['RGB_REDUCE']['b']"] == "bias"
    assert lbls["['RGB_REDUCE']['w']"] == "default"
    assert lbls["['BACKBONE']['cls_token']"] == "default"


@pytest.mark.slow
def test_data_parallel_8dev_matches_single_device():
    """DP over the virtual 8-CPU mesh == single-device step (same numerics)."""
    cfg, ecfg, batch = tiny_setup(batch=8)
    loss_func = make_loss(cfg, ecfg.num_classes)
    lr_fn = make_scheduler(cfg)
    from editor_tpu.models.editor import editor_init
    p, _ = editor_init(jax.random.PRNGKey(0), ecfg)
    opt = make_optimizer(cfg, p)

    state1 = make_train_state(jax.random.PRNGKey(0), ecfg, opt)
    step1 = build_train_step(ecfg, opt, loss_func, lr_fn, cfg.SOLVER.BASE_LR,
                             compute_dtype=jnp.float32, donate=False)
    state1, m1 = step1(state1, batch, jnp.asarray(1))

    mesh = make_mesh(data=8, model=1)
    state2 = make_train_state(jax.random.PRNGKey(0), ecfg, opt)
    step8 = build_train_step(ecfg, opt, loss_func, lr_fn, cfg.SOLVER.BASE_LR,
                             compute_dtype=jnp.float32, mesh=mesh, donate=False)
    sharded = shard_batch(mesh, batch)
    state2, m2 = step8(state2, sharded, jnp.asarray(1))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    l1 = jax.tree_util.tree_leaves(state1.params)
    l2 = jax.tree_util.tree_leaves(state2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_tail_keep_bound_covers_selection():
    """The static COMPACT_TAIL bound (_tail_keep_count) must dominate the
    union-mask population for ANY inputs: freq contributes exactly
    frequency_keep windows, each rollout head exactly head_keep tokens
    (sfts_select / part_attention_mask) — property-checked on random data."""
    from editor_tpu.models.sfts import sfts_select

    rng = np.random.RandomState(7)
    for trial in range(10):
        B, H, P = 5, rng.randint(2, 13), int(rng.choice([32, 64, 128]))
        C = 8
        keep_ph = rng.randint(1, 4)
        fkeep = rng.randint(1, 11)
        M = rng.randint(2, 4)
        feats = [jnp.asarray(rng.randn(B, 1 + P, C), jnp.float32)
                 for _ in range(M)]
        rolls = [jnp.asarray(np.abs(rng.randn(B, H, P)), jnp.float32)
                 for _ in range(M)]
        # frequency mask: exactly fkeep selected windows per image
        mf = np.zeros((B, P), bool)
        for b in range(B):
            mf[b, rng.choice(P, fkeep, replace=False)] = True
        _, index, _ = sfts_select(feats, rolls, jnp.asarray(mf), keep_ph,
                                  training=False)
        bound = fkeep + M * H * keep_ph
        counts = np.asarray(jnp.sum(index, axis=1))[:, 0]
        assert counts.max() <= min(bound, P)
        # the sublane-padded static keep (_tail_keep_count formula) always
        # dominates the bound, so compaction never drops a selected token
        assert ((bound + 8) // 8) * 8 - 1 >= bound


@pytest.mark.slow
def test_compact_tail_matches_full_tail():
    """TPU.COMPACT_TAIL gathers the fusion tail down to the ≤K selected
    patches per modality (models/editor.py:_compact_selected). The claim is
    exactness, not approximation: unselected rows are exactly zero after the
    SFTS mask-multiply and stay zero through the bias-free fusion block, so
    dropping them changes nothing (reference semantics make_model.py:186-203).
    Verified here on a grid large enough that compaction actually triggers
    (32 patches, bound = 2 + 3·4·1 = 14 → keep 15 < 32)."""
    import dataclasses

    from editor_tpu.models import editor_apply, editor_init
    from editor_tpu.models.editor import _tail_keep_count

    vit = ViTConfig(img_size=(128, 64), patch_size=16, stride_size=(16, 16),
                    embed_dim=96, depth=2, num_heads=4, mlp_ratio=2.0,
                    camera=4, drop_path_rate=0.0)
    full = EditorConfig(num_classes=4, vit=vit, head_keep=1, frequency_keep=2,
                        use_pallas=False, compact_tail=False)
    compact = dataclasses.replace(full, compact_tail=True)
    assert _tail_keep_count(compact, 3) < compact.num_patches

    rng = np.random.RandomState(1)
    B = 8
    imgs = {k: jnp.asarray(rng.randn(B, 128, 64, 3), jnp.float32)
            for k in ("RGB", "NI", "TI")}
    labels = jnp.asarray(np.repeat(np.arange(4), B // 4))
    camid = jnp.zeros((B,), jnp.int32)
    params, state = editor_init(jax.random.PRNGKey(0), full)

    # eval features
    f_full, _ = editor_apply(params, state, full, imgs, cam_ids=camid,
                             training=False)
    f_comp, _ = editor_apply(params, state, compact, imgs, cam_ids=camid,
                             training=False)
    np.testing.assert_allclose(np.asarray(f_full), np.asarray(f_comp),
                               rtol=2e-5, atol=2e-6)

    # train outputs + carried state
    o_full, s_full = editor_apply(params, state, full, imgs, labels=labels,
                                  cam_ids=camid, training=True,
                                  rng=jax.random.PRNGKey(2))
    o_comp, s_comp = editor_apply(params, state, compact, imgs, labels=labels,
                                  cam_ids=camid, training=True,
                                  rng=jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(o_full.score),
                               np.asarray(o_comp.score), rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(float(o_full.aux_loss), float(o_comp.aux_loss),
                               rtol=2e-5)
    for (a, b), (c, d) in zip(o_full.pairs, o_comp.pairs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(np.asarray(b), np.asarray(d),
                                   rtol=2e-5, atol=2e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s_full),
                    jax.tree_util.tree_leaves(s_comp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)

    # gradients of the total engine loss
    cfg = Config()
    loss_func = make_loss(cfg, full.num_classes)

    def total_loss(p, ecfg):
        o, _ = editor_apply(p, state, ecfg, imgs, labels=labels,
                            cam_ids=camid, training=True,
                            rng=jax.random.PRNGKey(2))
        return sum(loss_func(s, f, labels) for s, f in o.pairs) + o.aux_loss

    g_full = jax.grad(total_loss)(params, full)
    g_comp = jax.grad(total_loss)(params, compact)
    for a, b in zip(jax.tree_util.tree_leaves(g_full),
                    jax.tree_util.tree_leaves(g_comp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5)


def test_two_modal_forward_train_and_eval():
    """TI-absent (2-modal: RGBN300 / Market1501-MM after the NI->TI collate
    dup is DISABLED) path: fused sequence is 2 tiles, cls4t is [B, 2*dim],
    pairs = fused + 2 modality heads, gradients finite. The reference's own
    forward_two_modalities (make_model.py:260-360) is dead code with a
    latent crash; ours runs SFTS as intended (PARITY.md)."""
    from editor_tpu.models import editor_apply, editor_init

    import dataclasses
    cfg, ecfg, batch = tiny_setup()
    ecfg = dataclasses.replace(ecfg, num_modalities=2)
    imgs = {"RGB": batch["RGB"], "NI": batch["NI"]}  # no TI
    labels = batch["pid"]
    params, state = editor_init(jax.random.PRNGKey(0), ecfg)

    out, new_state = editor_apply(params, state, ecfg, imgs, labels=labels,
                                  cam_ids=batch["camid"], training=True,
                                  rng=jax.random.PRNGKey(1))
    dim = ecfg.vit.embed_dim
    assert out.cls4t.shape == (8, 2 * dim)
    assert len(out.pairs) == 3  # fused + RGB head + NIR head
    assert np.isfinite(float(out.aux_loss))
    for s, f in out.pairs:
        assert np.all(np.isfinite(np.asarray(s)))
        assert np.all(np.isfinite(np.asarray(f)))

    feat, _ = editor_apply(params, state, ecfg, imgs,
                           cam_ids=batch["camid"], training=False)
    assert feat.shape == (8, 2 * dim)
    assert np.all(np.isfinite(np.asarray(feat)))

    loss_func = make_loss(cfg, ecfg.num_classes)

    def loss_of(p):
        o, _ = editor_apply(p, state, ecfg, imgs, labels=labels,
                            cam_ids=batch["camid"], training=True,
                            rng=jax.random.PRNGKey(1))
        return sum(loss_func(s, f, labels) for s, f in o.pairs) + o.aux_loss

    grads = jax.grad(loss_of)(params)
    gn = sum(float(jnp.sum(jnp.abs(g))) for g in
             jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gn) and gn > 0
