"""Deferred BatchNorm: full-mini-batch BN statistics under GPipe
microbatching (reference: distributed/pipeline/sync/batchnorm.py:23
``DeferredBatchNorm``).

The problem it solves: a BN layer placed INSIDE a pipeline stage sees
microbatches, so its running statistics would track microbatch moments
instead of the mini-batch moments a non-pipelined model tracks. The
reference's solution (batchnorm.py:56-132): normalize every microbatch
with its OWN batch statistics (unchanged training semantics), but
accumulate per-microbatch ``sum`` / ``sum_squares`` / element counts in
module buffers and only fold them into ``running_mean`` / ``running_var``
once all ``chunks`` microbatches of the mini-batch have passed
(``_track`` / ``_commit``).

TPU-functional redesign: the mutable module buffers become an explicit
accumulator pytree carried as :func:`editor_tpu.parallel.pipeline_apply`
``stage_state`` (the scan carry holds it across clock ticks; the
``valid`` flag masks schedule bubbles, the analogue of the reference
guarding ``_track`` behind ``is_recomputing()`` — jax.checkpoint's
recompute cannot double-count a scan carry by construction, so only the
bubble masking is needed). ``commit`` runs once per mini-batch after the
pipeline returns, exactly like ``_commit`` firing on the last chunk.

Note the flagship EDITOR does not need this: its BN-necks and OCFR sit
OUTSIDE the pipelined backbone and see the full batch
(parallel/pipeline_vit.py). This module exists for library parity — any
user model with in-stage BN under microbatching.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def bn_params_init(num_features: int, dtype=jnp.float32) -> Dict[str, Array]:
    """gamma/beta + running stats (reference _BatchNorm buffers)."""
    return {
        "gamma": jnp.ones((num_features,), dtype),
        "beta": jnp.zeros((num_features,), dtype),
        "running_mean": jnp.zeros((num_features,), dtype),
        "running_var": jnp.ones((num_features,), dtype),
        "num_batches_tracked": jnp.zeros((), jnp.int32),
    }


def bn_acc_init(num_features: int, dtype=jnp.float32) -> Dict[str, Array]:
    """Zeroed per-mini-batch accumulator (reference sum/sum_squares/counter
    buffers, batchnorm.py:43-47). Use as pipeline ``stage_state`` (stack one
    per stage; stages without BN carry it untouched)."""
    return {
        "sum": jnp.zeros((num_features,), dtype),
        "sum_squares": jnp.zeros((num_features,), dtype),
        "count": jnp.zeros((), dtype),
    }


def deferred_bn_apply(params: Dict[str, Array], x: Array,
                      acc: Dict[str, Array], valid: Array,
                      eps: float = 1e-5,
                      ) -> Tuple[Array, Dict[str, Array]]:
    """One microbatch through deferred BN (reference forward,
    batchnorm.py:98-132, training branch).

    ``x`` is channel-LAST ([mb, ..., C] — JAX NHWC convention; the
    reference is NCHW). Normalizes with the microbatch's own (biased)
    moments — identical to what ``torch.nn.functional.batch_norm(...,
    training=True)`` computes — and accumulates mini-batch statistics
    masked by ``valid`` (False on pipeline warm-up/drain bubbles, whose
    buffer contents are not data; the reference never sees bubbles because
    its scheduler only invokes real chunks)."""
    red = tuple(range(x.ndim - 1))
    mean = jnp.mean(x, axis=red)
    var = jnp.var(x, axis=red)  # biased, like batch_norm's normalizer
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["gamma"] + params["beta"]

    # _track (batchnorm.py:56-70): plain sums, under stop_gradient like the
    # reference's torch.no_grad — statistics are not a gradient path
    v = jnp.asarray(valid, x.dtype)
    n = jnp.asarray(x.size // x.shape[-1], x.dtype)
    acc = {
        "sum": acc["sum"] + jax.lax.stop_gradient(v * jnp.sum(x, axis=red)),
        "sum_squares": acc["sum_squares"]
        + jax.lax.stop_gradient(v * jnp.sum(x * x, axis=red)),
        "count": acc["count"] + v * n,
    }
    return y, acc


def deferred_bn_commit(params: Dict[str, Array], acc: Dict[str, Array],
                       momentum: float = 0.1) -> Dict[str, Array]:
    """Fold the mini-batch accumulator into the running statistics
    (reference _commit, batchnorm.py:72-96): EMA with ``momentum``, or the
    cumulative moving average when ``momentum`` is None — mean and BIASED
    variance from sum/sum_squares. Returns new params (acc is spent;
    re-init with :func:`bn_acc_init` for the next mini-batch)."""
    tracked = params["num_batches_tracked"] + 1
    if momentum is None:
        m = 1.0 / tracked.astype(params["running_mean"].dtype)
    else:
        m = momentum
    mean = acc["sum"] / acc["count"]
    var = acc["sum_squares"] / acc["count"] - mean * mean
    out = dict(params)
    out["running_mean"] = (1 - m) * params["running_mean"] + m * mean
    out["running_var"] = (1 - m) * params["running_var"] + m * var
    out["num_batches_tracked"] = tracked
    return out
