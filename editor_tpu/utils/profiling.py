"""Profiling / tracing harness.

reference: the main path has only wall-clock samples/s logging
(engine/processor.py:114-118); the vendored stack adds an RPC-global
autograd profiler (rpc/server_process_global_profiler.py:14) and pipeline
auto-balance profiling (pipeline/sync/_balance/profile.py:44). SURVEY.md §5.1
prescribes the TPU equivalents: jax.profiler traces (Perfetto/TensorBoard),
a readback-barrier timing harness, and compiler cost analysis feeding the
pipeline stage partitioner (editor_tpu/parallel/pipeline.py balance_stages).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """Capture a device trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Scope annotation appearing in traces (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


def sync(tree: Any) -> None:
    """Completion barrier that works on tunneled platforms where
    block_until_ready returns early: force a scalar host readback."""
    leaves = [x for x in jax.tree_util.tree_leaves(tree)
              if isinstance(x, jax.Array)]
    if leaves:
        float(jnp.sum(leaves[0].ravel()[0]))


def benchmark(fn: Callable, *args, iters: int = 10, warmup: int = 1,
              **kwargs) -> Dict[str, float]:
    """Time a jitted callable with proper completion semantics.

    Returns {'mean_s', 'p50_s', 'min_s', 'iters'}.
    """
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    sync(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        sync(out)
        times.append(time.perf_counter() - t0)
    times = np.asarray(times)
    return {"mean_s": float(times.mean()), "p50_s": float(np.median(times)),
            "min_s": float(times.min()), "iters": iters}


def cost_analysis(fn: Callable, *args, **kwargs) -> Dict[str, float]:
    """XLA compiler cost model for a jittable fn: flops, HBM bytes, etc.
    Feeds balance_stages for cost-driven pipeline partitioning."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):
        costs = costs[0] if costs else {}
    return {k: float(v) for k, v in (costs or {}).items()
            if isinstance(v, (int, float))}


def flops_per_second(fn: Callable, *args, iters: int = 10,
                     **kwargs) -> Dict[str, float]:
    """Measured achieved FLOP/s against the compiler's flop estimate."""
    costs = cost_analysis(fn, *args, **kwargs)
    jfn = jax.jit(fn)
    timing = benchmark(jfn, *args, iters=iters, **kwargs)
    flops = costs.get("flops", 0.0)
    return {
        **timing,
        "flops": flops,
        "tflops_per_s": flops / timing["p50_s"] / 1e12 if flops else 0.0,
    }
