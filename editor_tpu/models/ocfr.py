"""OCFR — Object-Centric Feature Refinement loss with EMA class-center memory.

TPU-native equivalent of reference ``OCFR`` (modeling/fusion_part/OCFR.py:10-84).
The per-modality class-center memory is *explicit carried state* in the train
state (the one stateful module besides BN heads). The reference's
``labels.unique()`` loop becomes a one-hot segment-mean — static shapes, works
for any batch composition, and reduces over the data mesh axis with a single
psum when training data-parallel.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

MODS = ("rgb", "nir", "tir")


def ocfr_init(num_classes: int, dim: int = 768) -> Dict[str, Array]:
    # reference: OCFR.py:14-16 (zero-initialized, non-trainable)
    return {m: jnp.zeros((num_classes, dim), jnp.float32) for m in MODS}


def _l2_normalize(x: Array, eps: float = 1e-12) -> Array:
    # torch F.normalize semantics: x / max(||x||, eps)
    n = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / jnp.maximum(n, eps)


def ocfr_update_and_loss(
    centers: Dict[str, Array],
    cls_feats: List[Array],
    labels: Array,
    momentum: float = 0.8,
    alpha: float = 1.0,
) -> Tuple[Array, Dict[str, Array]]:
    """EMA-update centers with batch class means, then MSE(features, centers).

    Mirrors the reference order: ``update`` *first*, then intra loss against the
    updated centers (OCFR.py:44-59). Centers are detached (buffers).

    Args:
      cls_feats: per-modality [B, dim] cls tokens (2 or 3 modalities).
      labels: [B] int class ids.

    Returns:
      (alpha * summed intra loss, new centers dict).
    """
    num_classes = centers[MODS[0]].shape[0]
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)  # [B, K]
    counts = jnp.sum(onehot, axis=0)  # [K]
    present = counts > 0
    denom = jnp.maximum(counts, 1.0)[:, None]

    loss = jnp.asarray(0.0, jnp.float32)
    new_centers = dict(centers)
    for m, feat in zip(MODS, cls_feats):
        if feat is None:
            continue
        f = _l2_normalize(feat.astype(jnp.float32))
        batch_mean = (onehot.T @ jax.lax.stop_gradient(f)) / denom  # [K, dim]
        updated = jnp.where(
            present[:, None],
            momentum * batch_mean + (1.0 - momentum) * centers[m],
            centers[m],
        )
        new_centers[m] = updated
        # intra loss vs the *updated* center of each sample's class
        per_sample_center = jax.lax.stop_gradient(updated)[labels]  # [B, dim]
        loss = loss + jnp.mean(jnp.square(per_sample_center - f))
    return alpha * loss, new_centers
