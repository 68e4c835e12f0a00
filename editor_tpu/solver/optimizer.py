"""Optimizer factory with per-parameter group handling.

reference: solver/make_optimizer.py:4-29 — per-parameter groups: bias lr
× BIAS_LR_FACTOR with WEIGHT_DECAY_BIAS, optional 2× lr for classifier fc,
SGD(momentum=0.9) with *coupled* weight decay (torch semantics:
``g += wd * w`` before the momentum buffer), or AdamW (decoupled).

Design: a lightweight GradientTransformation-style object whose ``update``
takes the current scalar ``lr`` (the epoch-stepped cosine schedule runs
outside, as in the reference where the scheduler mutates group lrs). Per-leaf
lr factors / weight decays are static pytrees computed once from parameter
paths. The unused legacy ImageNet head ``BACKBONE.fc`` is frozen — in torch
it never receives gradients (grad=None → SGD skips it entirely).

ZeRO-1 sharding of the optimizer state (reference:
distributed/optim/zero_redundancy_optimizer.py:267) is expressed by sharding
these state pytrees over the data mesh axis — see editor_tpu/parallel/zero.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def param_group_labels(params: dict, large_fc_lr: bool = False) -> dict:
    """Label each leaf: 'default' | 'bias' | 'frozen'.

    Mirrors the torch loop over named_parameters (make_optimizer.py:5-19):
    any leaf whose key is 'b' (torch '*.bias') → bias group. LN/BN weight
    leaves are named 'w' here and stay default, same as torch '.weight'.
    """

    def label(path, leaf):
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        if "fc" in keys and "BACKBONE" in keys:
            return "frozen"  # unused legacy head: no grads in the reference
        if large_fc_lr and any(k in ("FUSE_HEAD", "BACKBONE_HEAD", "AL_HEAD")
                               for k in keys):
            return "fc"
        if keys and keys[-1] == "b":
            return "bias"
        return "default"

    return jax.tree_util.tree_map_with_path(label, params)


class SGDState(NamedTuple):
    momentum: Any  # pytree of momentum buffers


class AdamWState(NamedTuple):
    mu: Any
    nu: Any
    count: Array


@dataclasses.dataclass
class Optimizer:
    init: Callable[[dict], Any]
    update: Callable[..., Tuple[dict, Any]]  # (grads, state, params, lr) -> (new_params, new_state)
    name: str = "SGD"


def make_optimizer(cfg: Any, params: dict) -> Optimizer:
    labels = param_group_labels(params, large_fc_lr=cfg.SOLVER.LARGE_FC_LR)
    base_wd = cfg.SOLVER.WEIGHT_DECAY
    bias_wd = cfg.SOLVER.WEIGHT_DECAY_BIAS
    bias_f = cfg.SOLVER.BIAS_LR_FACTOR
    momentum = cfg.SOLVER.MOMENTUM
    name = cfg.SOLVER.OPTIMIZER_NAME

    lr_factor = jax.tree_util.tree_map(
        lambda lb: {"default": 1.0, "bias": bias_f, "fc": 2.0, "frozen": 0.0}[lb],
        labels)
    wd_tree = jax.tree_util.tree_map(
        lambda lb: {"default": base_wd, "bias": bias_wd, "fc": base_wd,
                    "frozen": 0.0}[lb], labels)

    if name == "SGD":
        def init(p):
            return SGDState(momentum=jax.tree_util.tree_map(jnp.zeros_like, p))

        def update(grads, state, p, lr):
            def leaf(g, w, buf, f, wd):
                g = g + wd * w  # torch coupled weight decay
                buf = momentum * buf + g
                return w - lr * f * buf, buf

            flat = jax.tree_util.tree_map(leaf, grads, p, state.momentum,
                                          lr_factor, wd_tree)
            new_p = jax.tree_util.tree_map(lambda t: t[0], flat,
                                           is_leaf=lambda t: isinstance(t, tuple))
            new_m = jax.tree_util.tree_map(lambda t: t[1], flat,
                                           is_leaf=lambda t: isinstance(t, tuple))
            return new_p, SGDState(momentum=new_m)

        return Optimizer(init=init, update=update, name="SGD")

    if name == "AdamW":
        b1, b2, eps = 0.9, 0.999, 1e-8

        def init(p):
            z = jax.tree_util.tree_map(jnp.zeros_like, p)
            return AdamWState(mu=z, nu=jax.tree_util.tree_map(jnp.zeros_like, p),
                              count=jnp.zeros((), jnp.int32))

        def update(grads, state, p, lr):
            count = state.count + 1
            c1 = 1.0 - b1 ** count.astype(jnp.float32)
            c2 = 1.0 - b2 ** count.astype(jnp.float32)

            def leaf(g, w, mu, nu, f, wd):
                mu = b1 * mu + (1 - b1) * g
                nu = b2 * nu + (1 - b2) * g * g
                step = (mu / c1) / (jnp.sqrt(nu / c2) + eps)
                w = w - lr * f * (step + wd * w)  # decoupled decay
                return w, mu, nu

            flat = jax.tree_util.tree_map(leaf, grads, p, state.mu, state.nu,
                                          lr_factor, wd_tree)
            pick = lambda i: jax.tree_util.tree_map(
                lambda t: t[i], flat, is_leaf=lambda t: isinstance(t, tuple))
            return pick(0), AdamWState(mu=pick(1), nu=pick(2), count=count)

        return Optimizer(init=init, update=update, name="AdamW")

    raise ValueError(f"unsupported optimizer '{name}'")
