"""Cosine LR schedule with warmup — timm CosineLRScheduler semantics.

reference: solver/scheduler_factory.py:7-31, solver/cosine_lr.py:17-115.
Epoch-stepped (``t_in_epochs=True``, stepped once per epoch with the 1-based
epoch number, engine/processor.py:68). Pure jnp so the traced epoch can flow
into the jitted train step.

The full reference surface is covered: ``t_mul`` (geometric cycle growth),
``decay_rate`` restarts, ``cycle_limit`` (0 = unlimited), ``warmup_prefix``,
and the epoch-scalar LR noise of the Scheduler base class
(solver/scheduler.py:87-107, host-side — see :func:`add_lr_noise`). The
shipped factory (scheduler_factory.py) hardwires t_mul=1 / noise off, so the
default engine path never pays for either.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Union

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
    t_mul: float = 1.0,
    warmup_prefix: bool = False,
):
    """lr at epoch ``t`` (traced or python int) for one param-group base lr.

    Mirrors CosineLRScheduler._get_lr (cosine_lr.py:67-94), including the
    ``t_mul != 1`` geometric-restart branch (cycle i starts at
    ``(1-t_mul^i)/(1-t_mul) * t_initial`` and lasts ``t_mul^i * t_initial``).
    """
    t = jnp.asarray(t, jnp.float32)
    warmup_step = (base_lr - warmup_lr_init) / max(warmup_t, 1)
    warmup_lr = warmup_lr_init + t * warmup_step

    tm = t - warmup_t if warmup_prefix else t
    if t_mul != 1.0:
        # floor(log_{t_mul}(1 - t/t_initial * (1 - t_mul))); +1e-6 guards
        # f32 log rounding at exact cycle boundaries (the ratio is an
        # integer there; integer epochs keep legit values ≫1e-6 below it)
        i = jnp.floor(jnp.log1p(-tm / t_initial * (1.0 - t_mul))
                      / math.log(t_mul) + 1e-6)
        t_i = t_mul ** i * t_initial
        t_curr = tm - (1.0 - t_mul ** i) / (1.0 - t_mul) * t_initial
    else:
        i = jnp.floor(tm / t_initial)
        t_i = jnp.asarray(float(t_initial))
        t_curr = tm - t_initial * i
    gamma = decay_rate ** i
    lr_min_i = lr_min * gamma
    lr_max_i = base_lr * gamma
    cos_lr = lr_min_i + 0.5 * (lr_max_i - lr_min_i) * (
        1.0 + jnp.cos(math.pi * t_curr / t_i))
    past_limit = i >= cycle_limit if cycle_limit > 0 else jnp.asarray(False)
    main_lr = jnp.where(past_limit, lr_min, cos_lr)
    return jnp.where(t < warmup_t, warmup_lr, main_lr)


def add_lr_noise(
    lr: float,
    t: int,
    noise_range_t: Optional[Union[int, Sequence[int]]],
    noise_pct: float = 0.67,
    noise_std: float = 1.0,
    noise_seed: int = 42,
    noise_type: str = "normal",
) -> float:
    """Scheduler._add_noise (reference solver/scheduler.py:87-107): a
    per-epoch scalar perturbation, bit-matched to the torch generator it
    seeds (``noise_seed + t``). Host-side by construction — the reference
    applies it outside the step too, between ``_get_lr`` and the optimizer
    group update, so it composes as ``add_lr_noise(float(lr_fn(...)), t,
    ...)``. Never active in the shipped factory (noise_range=None)."""
    if noise_range_t is None:
        return lr
    if isinstance(noise_range_t, (list, tuple)):
        apply_noise = noise_range_t[0] <= t < noise_range_t[1]
    else:
        apply_noise = t >= noise_range_t
    if not apply_noise:
        return lr
    import torch

    g = torch.Generator()
    g.manual_seed(noise_seed + t)
    if noise_type == "normal":
        while True:
            noise = torch.randn(1, generator=g).item()
            if abs(noise) < noise_pct:
                break
    else:
        noise = 2 * (torch.rand(1, generator=g).item() - 0.5) * noise_pct
    return lr + lr * noise


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
