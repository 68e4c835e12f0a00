"""Center loss (Wen et al., ECCV 2016).

reference: layers/center_loss.py:7-57. The centers are trainable parameters
with their own SGD(lr=CENTER_LR) optimizer (reference: solver/make_optimizer.py:27).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def center_loss_init(key: Array, num_classes: int, feat_dim: int = 2048) -> dict:
    return {"centers": jax.random.normal(key, (num_classes, feat_dim))}


def center_loss(params: dict, x: Array, labels: Array) -> Array:
    """sum of squared distances to own-class center / batch_size, with the
    reference's clamp(1e-12, 1e12)."""
    centers = params["centers"].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    B = x.shape[0]
    d = (jnp.sum(xf * xf, axis=1, keepdims=True)
         + jnp.sum(centers * centers, axis=1)[None, :]
         - 2.0 * xf @ centers.T)
    mask = jax.nn.one_hot(labels, centers.shape[0], dtype=jnp.float32)
    return jnp.sum(jnp.clip(d * mask, 1e-12, 1e12)) / B
