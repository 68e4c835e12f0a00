"""Auxiliary metric losses available off the main path.

reference: layers/cluster_loss.py (ClusterLoss), layers/range_loss.py
(RangeLoss), layers/hcloss.py (hetero_loss), layers/mutilmargin.py
(multiModalMarginLossNew) — configured via SOLVER.RANGE_*/CLUSTER_MARGIN
(config/defaults.py:111-123). All vectorized for P×K batches (the reference
exploits the same layout via ``targets[::imgs_per_id]``,
cluster_loss.py:46-48) — no per-class Python loops.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _pk_centers(features: Array, P: int, K: int) -> Array:
    """Class centers for a P×K-ordered batch → [P, dim]."""
    return jnp.mean(features.reshape(P, K, -1), axis=1)


def _ct(x: Array):
    """Compute dtype: f32 floor, exact under f64 inputs (golden tests)."""
    return jnp.promote_types(x.dtype, jnp.float32)


def _dist(x: Array, y: Array) -> Array:
    xf = x.astype(_ct(x))
    yf = y.astype(_ct(y))
    d = (jnp.sum(xf * xf, 1, keepdims=True) + jnp.sum(yf * yf, 1) - 2 * xf @ yf.T)
    return jnp.sqrt(jnp.clip(d, 1e-12, None))


def cluster_loss(features: Array, targets: Array, P: int, K: int,
                 margin: float = 10.0) -> Tuple[Array, Array, Array]:
    """ClusterLoss (cluster_loss.py:33-103): per class, margin between the
    max center-to-member distance and the min center-to-center distance."""
    centers = _pk_centers(features, P, K)  # [P, dim]
    feats = features.reshape(P, K, -1).astype(_ct(features))
    intra = jnp.linalg.norm(feats - centers[:, None, :], axis=-1)
    intra_max = jnp.max(intra, axis=1)  # [P]
    cdist = _dist(centers, centers)
    inf = jnp.asarray(jnp.finfo(_ct(features)).max)
    inter_min = jnp.min(cdist + inf * jnp.eye(P), axis=1)  # [P]
    loss = jnp.mean(jax.nn.relu(intra_max - inter_min + margin))
    return loss, intra_max, inter_min


def range_loss(features: Array, targets: Array, P: int, K: int,
               k: int = 2, margin: float = 0.1, alpha: float = 0.5,
               beta: float = 0.5) -> Tuple[Array, Array, Array]:
    """RangeLoss (range_loss.py): intra = harmonic mean of the k largest
    intra-class pairwise distances summed over classes; inter =
    relu(margin - min center distance)."""
    feats = features.reshape(P, K, -1).astype(_ct(features))

    def per_class(f):
        d = _dist(f, f)  # [K, K], symmetric, zero diag
        iu = jnp.triu(jnp.ones((K, K), bool), 1)
        vals = jnp.where(iu, d, -jnp.inf).reshape(-1)
        top = jax.lax.top_k(vals, k)[0]
        return k / jnp.sum(1.0 / jnp.clip(top, 1e-12, None))

    intra = jax.vmap(per_class)(feats)  # [P]
    intra_loss = jnp.sum(intra)
    centers = _pk_centers(features, P, K)
    cdist = _dist(centers, centers)
    inf = jnp.asarray(jnp.finfo(_ct(features)).max)
    min_center = jnp.min(cdist + inf * jnp.eye(P))
    inter_loss = jax.nn.relu(margin - min_center)
    return alpha * intra_loss + beta * inter_loss, intra_loss, inter_loss


def hetero_center_loss(feat1: Array, feat2: Array, P: int, K: int,
                       margin: float = 0.1, dist_type: str = "l2") -> Array:
    """hetero_loss (hcloss.py:6-39): per-class distance between the two
    modalities' centers, summed over classes."""
    c1 = _pk_centers(feat1, P, K).astype(_ct(feat1))
    c2 = _pk_centers(feat2, P, K).astype(_ct(feat2))
    if dist_type == "l2":
        d = jnp.sum(jnp.square(c1 - c2), axis=1)  # MSE(reduction=sum) per class
    elif dist_type == "l1":
        d = jnp.mean(jnp.abs(c1 - c2), axis=1)
    elif dist_type == "cos":
        cs = jnp.sum(c1 * c2, 1) / (jnp.linalg.norm(c1, axis=1)
                                    * jnp.linalg.norm(c2, axis=1) + 1e-12)
        d = jax.nn.relu(1.0 - cs)
    else:
        raise ValueError(dist_type)
    return jnp.sum(jax.nn.relu(jnp.abs(d)))


def multi_modal_margin_loss(feat1: Array, feat2: Array, feat3: Array,
                            targets: Array, P: int, K: int,
                            margin: float = 3.0) -> Array:
    """multiModalMarginLossNew (mutilmargin.py:7-41): per class, the max over
    modality pairs of |margin - sum-squared center distance|, summed."""
    c1 = _pk_centers(feat1, P, K).astype(_ct(feat1))
    c2 = _pk_centers(feat2, P, K).astype(_ct(feat2))
    c3 = _pk_centers(feat3, P, K).astype(_ct(feat3))
    d12 = jnp.sum(jnp.square(c1 - c2), axis=1)
    d23 = jnp.sum(jnp.square(c2 - c3), axis=1)
    d13 = jnp.sum(jnp.square(c1 - c3), axis=1)
    per_class = jnp.maximum(jnp.maximum(jnp.abs(margin - d12),
                                        jnp.abs(margin - d23)),
                            jnp.abs(margin - d13))
    return jnp.sum(per_class)
