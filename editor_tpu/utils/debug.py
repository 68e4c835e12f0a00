"""Numerical and collective debugging aids.

reference equivalents (SURVEY.md §5.2): c10d debug levels with the
ProcessGroupWrapper collective-consistency checker
(distributed/distributed_c10d.py:2806-2822) and ``monitored_barrier`` that
names the straggler rank (:2742-2805).

In the TPU design most of that class of bug is *statically impossible*:
shard_map signatures pin collective shapes/dtypes at trace time, and pure
functions remove data races. What remains — NaN/Inf propagation and
cross-host desyncs — is covered here.
"""

from __future__ import annotations

import time
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def enable_nan_checks(enable: bool = True) -> None:
    """Global NaN trap: computations raise at the op producing a NaN
    (debug_nans is the torch.autograd anomaly-mode analogue)."""
    jax.config.update("jax_debug_nans", enable)


def nonfinite_leaves(tree: Any) -> List[str]:
    """Paths of pytree leaves containing NaN/Inf (host-side sweep)."""
    bad = []
    for kp, leaf in jax.tree_util.tree_leaves_with_path(tree):
        if isinstance(leaf, (jax.Array, np.ndarray)):
            arr = np.asarray(leaf)
            if arr.dtype.kind == "f" and not np.isfinite(arr).all():
                bad.append(jax.tree_util.keystr(kp))
    return bad


def assert_tree_finite(tree: Any, name: str = "tree") -> None:
    bad = nonfinite_leaves(tree)
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad[:10]}"
                                 + (" ..." if len(bad) > 10 else ""))


def checked_update(step_fn, check_every: int = 100):
    """Wrap a train step: sweep the new state for NaN/Inf every N steps.
    Cheap insurance without per-step host sync."""
    counter = {"n": 0}

    def wrapped(state, *args, **kwargs):
        out = step_fn(state, *args, **kwargs)
        counter["n"] += 1
        if counter["n"] % check_every == 0:
            new_state = out[0] if isinstance(out, tuple) else out
            assert_tree_finite(jax.device_get(
                jax.tree_util.tree_map(
                    lambda x: x if isinstance(x, jax.Array) else None,
                    new_state)), "train state")
        return out

    return wrapped


def monitored_barrier(timeout_s: float = 60.0,
                      name: str = "barrier") -> float:
    """Cross-host barrier with a deadline (monitored_barrier equivalent,
    distributed_c10d.py:2742). JAX's sync cannot name the straggler rank —
    the elastic supervisor's heartbeat watchdog covers per-worker liveness
    — but the timeout converts a silent hang into an actionable error."""
    from jax.experimental import multihost_utils
    if jax.process_count() == 1:
        return 0.0
    t0 = time.time()
    multihost_utils.sync_global_devices(name)
    dt = time.time() - t0
    if dt > timeout_s:
        raise TimeoutError(
            f"{name}: barrier took {dt:.1f}s (> {timeout_s}s) — check worker "
            f"heartbeats in the elastic supervisor logs")
    return dt


def summarize_tree(tree: Any, max_leaves: int = 20) -> str:
    """Human-readable leaf stats for debugging divergence."""
    lines = []
    for kp, leaf in jax.tree_util.tree_leaves_with_path(tree)[:max_leaves]:
        if isinstance(leaf, (jax.Array, np.ndarray)):
            arr = np.asarray(leaf)
            if arr.dtype.kind == "f":
                lines.append(f"{jax.tree_util.keystr(kp)}: shape={arr.shape} "
                             f"mean={arr.mean():.4g} std={arr.std():.4g} "
                             f"absmax={np.abs(arr).max():.4g}")
    return "\n".join(lines)
