"""Loss factory — builds the combined ReID loss closure.

reference: layers/make_loss.py:12-81. The closure computes
``ID_LOSS_WEIGHT * CE + TRIPLET_LOSS_WEIGHT * triplet`` per (score, feat)
pair, with the reference's list handling (0.5 * first + 0.5 * mean of rest)
and target repetition when feat rows are a multiple of the batch.
"""

from __future__ import annotations

from typing import Any, Callable, List, Tuple, Union

import jax
import jax.numpy as jnp

from editor_tpu.losses.softmax import cross_entropy, cross_entropy_label_smooth
from editor_tpu.losses.triplet import batch_hard_triplet

Array = jax.Array


def make_loss(cfg: Any, num_classes: int) -> Callable:
    """Returns loss_func(score, feat, target) -> scalar.

    score/feat may each be a single array or a list of arrays (reference:
    make_loss.py:41-56).
    """
    sampler = cfg.DATALOADER.SAMPLER
    use_smooth = cfg.MODEL.IF_LABELSMOOTH == "on"
    margin = None if cfg.MODEL.NO_MARGIN else cfg.SOLVER.MARGIN
    id_w = cfg.MODEL.ID_LOSS_WEIGHT
    tri_w = cfg.MODEL.TRIPLET_LOSS_WEIGHT

    def xent(score, target):
        if use_smooth:
            return cross_entropy_label_smooth(score, target, num_classes)
        return cross_entropy(score, target)

    def tri(feat, target):
        return batch_hard_triplet(feat, target, margin=margin)

    if sampler == "softmax":
        def loss_func(score, feat, target):
            return cross_entropy(score, target)
        return loss_func

    if sampler != "softmax_triplet":
        raise ValueError(f"unsupported sampler '{sampler}'")

    def loss_func(score: Union[Array, List[Array]],
                  feat: Union[Array, List[Array]], target: Array) -> Array:
        # target repetition for stacked features (make_loss.py:37-38)
        t = target
        f0 = feat[0] if isinstance(feat, (list, tuple)) else feat
        if f0.shape[0] != t.shape[0]:
            t = jnp.tile(t, f0.shape[0] // t.shape[0])
        if isinstance(score, (list, tuple)):
            rest = [xent(s, t) for s in score[1:]]
            id_loss = 0.5 * (sum(rest) / len(rest)) + 0.5 * xent(score[0], t)
        else:
            id_loss = xent(score, t)
        if isinstance(feat, (list, tuple)):
            rest = [tri(f, t) for f in feat[1:]]
            tri_loss = 0.5 * (sum(rest) / len(rest)) + 0.5 * tri(feat[0], t)
        else:
            tri_loss = tri(feat, t)
        return id_w * id_loss + tri_w * tri_loss

    return loss_func
