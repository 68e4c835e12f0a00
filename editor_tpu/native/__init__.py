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


# ---------------------------------------------------------------------------
# native batch JPEG decode + bicubic resize (imagecodec.cpp)
# ---------------------------------------------------------------------------

_CODEC_SRC = os.path.join(_HERE, "imagecodec.cpp")
_CODEC_LIB: Optional[ctypes.CDLL] = None
_CODEC_FAILED = False


def load_imagecodec() -> Optional[ctypes.CDLL]:
    """Build (once) and load the JPEG codec library; None if unavailable
    (no g++ / no libjpeg dev headers)."""
    global _CODEC_LIB, _CODEC_FAILED
    with _LOCK:
        if _CODEC_LIB is not None or _CODEC_FAILED:
            return _CODEC_LIB
        so = os.path.join(_build_dir(), "libeditor_tpu_imagecodec.so")
        try:
            if (not os.path.exists(so)
                    or os.path.getmtime(so) < os.path.getmtime(_CODEC_SRC)):
                cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
                       "-fPIC", "-fopenmp", _CODEC_SRC, "-ljpeg", "-o", so]
                subprocess.run(cmd, check=True, capture_output=True)
            lib = ctypes.CDLL(so)
            fn = lib.editor_tpu_decode_resize_batch
            fn.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            ]
            fn.restype = ctypes.c_int32
            fn2 = lib.editor_tpu_decode_multicrop_batch
            fn2.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
                ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int32,
                np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            ]
            fn2.restype = ctypes.c_int32
            _CODEC_LIB = lib
        except (subprocess.CalledProcessError, OSError, AttributeError):
            # AttributeError: a stale cached .so missing a newer symbol
            # (e.g. restored EDITOR_TPU_NATIVE_CACHE volume) must trip the
            # PIL fallback, not crash every batch
            _CODEC_FAILED = True
            _CODEC_LIB = None
        return _CODEC_LIB


def decode_resize_batch(paths, out_hw, crop_x0=None, crop_w: int = 0,
                        crop_h: int = 0) -> np.ndarray:
    """Decode ``paths`` (JPEGs) and bicubic-resize to ``out_hw`` = (H, W)
    in parallel (OpenMP). ``crop_w > 0`` crops [crop_x0[i], +crop_w) x
    [0, crop_h) first (the wide-JPEG modality tiling, reference
    bases.py:21-26). Returns u8 [n, H, W, 3]. RuntimeError if the native
    library is unavailable or any decode fails (callers fall back to PIL).
    """
    lib = load_imagecodec()
    if lib is None:
        raise RuntimeError("native imagecodec unavailable")
    h, w = out_hw
    n = len(paths)
    out = np.empty((n, h, w, 3), np.uint8)
    arr = (ctypes.c_char_p * n)(*[os.fsencode(p) for p in paths])
    if crop_x0 is not None:
        cx = np.ascontiguousarray(np.asarray(crop_x0, np.int32))
        cx_ptr = cx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    else:
        cx_ptr = None
    failures = lib.editor_tpu_decode_resize_batch(
        arr, n, cx_ptr, int(crop_w), int(crop_h), h, w, out)
    if failures:
        raise RuntimeError(f"{failures}/{n} decodes failed")
    return out


def decode_resize_multicrop(paths, out_hw, crop_x0, crop_w: int,
                            crop_h: int) -> np.ndarray:
    """Decode each JPEG in ``paths`` ONCE and emit ``k`` crops per image
    (``crop_x0``: [n, k] tile origins, each [x0, x0+crop_w) x [0, crop_h)),
    bicubic-resized to ``out_hw``. Returns u8 [n*k, H, W, 3] in image-major
    order — the wide-JPEG modality tiling without re-decoding per tile."""
    lib = load_imagecodec()
    if lib is None:
        raise RuntimeError("native imagecodec unavailable")
    h, w = out_hw
    cx = np.ascontiguousarray(np.asarray(crop_x0, np.int32))
    n, k = cx.shape
    out = np.empty((n * k, h, w, 3), np.uint8)
    arr = (ctypes.c_char_p * n)(*[os.fsencode(p) for p in paths])
    failures = lib.editor_tpu_decode_multicrop_batch(
        arr, n, k, cx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        int(crop_w), int(crop_h), h, w, out)
    if failures:
        raise RuntimeError(f"{failures}/{n * k} decodes failed")
    return out
