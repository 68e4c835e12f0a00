"""ID (classification) losses.

reference: layers/softmax_loss.py:4-56.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def cross_entropy_label_smooth(logits: Array, targets: Array,
                               num_classes: int, epsilon: float = 0.1) -> Array:
    """CrossEntropyLabelSmooth (reference: softmax_loss.py:4-34):
    ``loss = (-t * log_softmax(x)).mean(0).sum()`` with
    ``t = (1-eps)*onehot + eps/K``."""
    cd = jnp.promote_types(logits.dtype, jnp.float32)
    logp = jax.nn.log_softmax(logits.astype(cd), axis=1)
    onehot = jax.nn.one_hot(targets, num_classes, dtype=cd)
    t = (1.0 - epsilon) * onehot + epsilon / num_classes
    return jnp.sum(jnp.mean(-t * logp, axis=0))


def label_smoothing_ce(logits: Array, targets: Array,
                       smoothing: float = 0.1) -> Array:
    """LabelSmoothingCrossEntropy (reference: softmax_loss.py:36-56):
    NLL + uniform smoothing over classes."""
    logp = jax.nn.log_softmax(
        logits.astype(jnp.promote_types(logits.dtype, jnp.float32)), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]
    smooth = -jnp.mean(logp, axis=-1)
    return jnp.mean((1.0 - smoothing) * nll + smoothing * smooth)


def cross_entropy(logits: Array, targets: Array) -> Array:
    """Plain CE (torch F.cross_entropy, mean reduction)."""
    logp = jax.nn.log_softmax(
        logits.astype(jnp.promote_types(logits.dtype, jnp.float32)), axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, targets[:, None], axis=-1))
