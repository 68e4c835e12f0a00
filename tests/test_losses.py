import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from editor_tpu.losses import (
    batch_hard_triplet,
    center_loss,
    center_loss_init,
    cross_entropy_label_smooth,
    euclidean_dist,
    hard_example_mining,
    make_loss,
)


def test_label_smooth_ce_matches_torch():
    """Parity with the reference formula (softmax_loss.py:23-34) computed in
    torch directly (no reference code imported)."""
    rng = np.random.RandomState(0)
    logits = rng.randn(8, 5).astype(np.float32)
    targets = rng.randint(0, 5, size=8)
    ours = float(cross_entropy_label_smooth(jnp.asarray(logits),
                                            jnp.asarray(targets), 5))
    lt = torch.tensor(logits)
    tt = torch.tensor(targets)
    logp = F.log_softmax(lt, dim=1)
    onehot = torch.zeros_like(logp).scatter_(1, tt.unsqueeze(1), 1)
    smoothed = 0.9 * onehot + 0.1 / 5
    expected = float((-smoothed * logp).mean(0).sum())
    assert abs(ours - expected) < 5e-5


def test_hard_mining_matches_pxk_semantics():
    """Masked max/min mining == the reference's view(N,-1) trick on P×K."""
    rng = np.random.RandomState(1)
    feat = rng.randn(16, 8).astype(np.float32)  # P=4, K=4
    labels = np.repeat(np.arange(4), 4)
    d = euclidean_dist(jnp.asarray(feat), jnp.asarray(feat))
    ap, an = hard_example_mining(d, jnp.asarray(labels))
    dn = np.asarray(d)
    for i in range(16):
        pos = labels == labels[i]
        assert abs(float(ap[i]) - dn[i][pos].max()) < 1e-5
        assert abs(float(an[i]) - dn[i][~pos].min()) < 1e-5


def test_soft_margin_triplet_matches_torch():
    rng = np.random.RandomState(2)
    feat = rng.randn(16, 8).astype(np.float32)
    labels = np.repeat(np.arange(4), 4)
    ours = float(batch_hard_triplet(jnp.asarray(feat), jnp.asarray(labels)))
    # torch re-computation of the same loss
    ft = torch.tensor(feat)
    d = torch.cdist(ft, ft).clamp(min=1e-6)
    lt = torch.tensor(labels)
    pos = lt[:, None] == lt[None, :]
    ap = d.masked_fill(~pos, -1e9).max(1).values
    an = d.masked_fill(pos, 1e9).min(1).values
    expected = float(F.soft_margin_loss(an - ap, torch.ones_like(ap)))
    assert abs(ours - expected) < 1e-4


def test_margin_triplet():
    rng = np.random.RandomState(3)
    feat = rng.randn(8, 4).astype(np.float32)
    labels = np.repeat(np.arange(2), 4)
    loss = float(batch_hard_triplet(jnp.asarray(feat), jnp.asarray(labels),
                                    margin=0.3))
    assert loss >= 0


def test_center_loss():
    params = center_loss_init(jax.random.PRNGKey(0), 5, 8)
    x = jax.random.normal(jax.random.PRNGKey(1), (10, 8))
    labels = jnp.asarray(np.random.RandomState(4).randint(0, 5, 10))
    loss = float(center_loss(params, x, labels))
    assert loss > 0


def test_make_loss_closure_and_lists():
    from editor_tpu.config import Config
    cfg = Config()
    loss_func = make_loss(cfg, num_classes=5)
    key = jax.random.PRNGKey(0)
    score = jax.random.normal(key, (8, 5))
    feat = jax.random.normal(key, (8, 16))
    labels = jnp.asarray(np.repeat(np.arange(2), 4))
    l1 = float(loss_func(score, feat, labels))
    assert np.isfinite(l1)
    # list handling: 0.5 * first + 0.5 * mean(rest) (make_loss.py:41-52)
    l2 = float(loss_func([score, score, score], [feat, feat, feat], labels))
    np.testing.assert_allclose(l2, l1, rtol=1e-5)
