"""Native (C++) host-runtime components, bound via ctypes.

The TPU compute path is XLA/Pallas; these are the host-side hot loops the
reference reaches through torch's C++ core (SURVEY.md §2.4). Currently:
k-reciprocal re-ranking (the CPU-bound eval hot loop, utils/reranking.py).

Built on demand with g++ -O3 -fopenmp; falls back cleanly if no toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "reranking.cpp")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_BUILD_FAILED = False


def _build_dir() -> str:
    d = os.environ.get("EDITOR_TPU_NATIVE_CACHE",
                       os.path.join(_HERE, "_build"))
    os.makedirs(d, exist_ok=True)
    return d


def load_native() -> Optional[ctypes.CDLL]:
    """Build (once) and load the native library; None if unavailable."""
    global _LIB, _BUILD_FAILED
    with _LOCK:
        if _LIB is not None or _BUILD_FAILED:
            return _LIB
        so = os.path.join(_build_dir(), "libeditor_tpu_native.so")
        try:
            if (not os.path.exists(so)
                    or os.path.getmtime(so) < os.path.getmtime(_SRC)):
                cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
                       "-fPIC", "-fopenmp", _SRC, "-o", so]
                subprocess.run(cmd, check=True, capture_output=True)
            lib = ctypes.CDLL(so)
            fn = lib.editor_tpu_k_reciprocal_rerank
            fn.argtypes = [
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_float,
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            ]
            fn.restype = None
            _LIB = lib
        except (subprocess.CalledProcessError, OSError) as e:  # no toolchain
            _BUILD_FAILED = True
            _LIB = None
        return _LIB


def k_reciprocal_rerank_native(prob_feat: np.ndarray, gal_feat: np.ndarray,
                               k1: int = 20, k2: int = 6,
                               lambda_value: float = 0.3) -> np.ndarray:
    """Native-accelerated re-ranking; numerically equivalent to
    editor_tpu.evals.reranking.k_reciprocal_rerank. Raises RuntimeError if
    the native library is unavailable (callers fall back to numpy)."""
    lib = load_native()
    if lib is None:
        raise RuntimeError("native reranking library unavailable")
    nq = prob_feat.shape[0]
    feat = np.concatenate([np.asarray(prob_feat, np.float32),
                           np.asarray(gal_feat, np.float32)], axis=0)
    sq = np.sum(feat ** 2, axis=1)
    d = np.maximum(sq[:, None] + sq[None, :] - 2.0 * feat @ feat.T, 0.0)
    original = np.ascontiguousarray(
        (d / np.max(d, axis=0, keepdims=True)).T.astype(np.float32))
    n = original.shape[0]
    out = np.empty((nq, n - nq), np.float32)
    lib.editor_tpu_k_reciprocal_rerank(original, n, nq, k1, k2,
                                       np.float32(lambda_value), out)
    return out


def rerank_auto(prob_feat, gal_feat, k1=20, k2=6, lambda_value=0.3):
    """Native if available, else the numpy reference implementation."""
    try:
        return k_reciprocal_rerank_native(prob_feat, gal_feat, k1, k2,
                                          lambda_value)
    except RuntimeError:
        from editor_tpu.evals.reranking import k_reciprocal_rerank
        return k_reciprocal_rerank(prob_feat, gal_feat, k1, k2, lambda_value)
