"""Cosine LR schedule with warmup — timm CosineLRScheduler semantics.

reference: solver/scheduler_factory.py:7-31, solver/cosine_lr.py:17-115.
Epoch-stepped (``t_in_epochs=True``, stepped once per epoch with the 1-based
epoch number, engine/processor.py:68). Pure jnp so the traced epoch can flow
into the jitted train step.
"""

from __future__ import annotations

import math
from typing import Any, Callable

import jax.numpy as jnp


def cosine_lr_schedule(
    t,
    base_lr: float,
    t_initial: int,
    lr_min: float,
    warmup_t: int,
    warmup_lr_init: float,
    decay_rate: float = 0.1,
    cycle_limit: int = 1,
):
    """lr at epoch ``t`` (traced or python int) for one param-group base lr.

    Mirrors CosineLRScheduler._get_lr (cosine_lr.py:67-94) with t_mul=1.
    """
    t = jnp.asarray(t, jnp.float32)
    warmup_step = (base_lr - warmup_lr_init) / max(warmup_t, 1)
    warmup_lr = warmup_lr_init + t * warmup_step

    i = jnp.floor(t / t_initial)
    t_curr = t - t_initial * i
    gamma = decay_rate ** i
    lr_min_i = lr_min * gamma
    lr_max_i = base_lr * gamma
    cos_lr = lr_min_i + 0.5 * (lr_max_i - lr_min_i) * (
        1.0 + jnp.cos(math.pi * t_curr / t_initial))
    past_limit = i >= cycle_limit if cycle_limit > 0 else jnp.asarray(False)
    main_lr = jnp.where(past_limit, lr_min, cos_lr)
    return jnp.where(t < warmup_t, warmup_lr, main_lr)


def make_scheduler(cfg: Any) -> Callable:
    """create_scheduler equivalent (scheduler_factory.py:7-31):
    returns ``lr_fn(epoch, base_lr) -> lr``; base_lr varies per param group."""
    base = cfg.SOLVER.BASE_LR

    def lr_fn(epoch, group_base_lr):
        return cosine_lr_schedule(
            epoch,
            base_lr=group_base_lr,
            t_initial=cfg.SOLVER.MAX_EPOCHS,
            lr_min=0.001 * base,
            warmup_t=cfg.SOLVER.WARMUP_ITERS,
            warmup_lr_init=0.01 * base,
            decay_rate=0.1,
            cycle_limit=1,
        )

    return lr_fn
