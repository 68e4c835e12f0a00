"""Import shim for building the actual reference EDITOR (PyTorch, CPU).

The reference at /root/reference imports three things this image lacks:
``pywt`` (only the haar filter coefficients are ever used,
reference pytorch_wavelets/dwt/transform2d.py:22-26), ``pkg_resources``
(reference pytorch_wavelets/dtcwt/coeffs.py:7, import-time only), and CUDA
(`.cuda()` sprinkled on tensors/modules, e.g. reference
modeling/fusion_part/Frequency.py:13-14, SFTS.py:157, vit_pytorch.py:310).
This module stubs all three so `modeling` imports and runs on CPU torch,
giving the strongest available parity oracle (no datasets on disk).
"""

from __future__ import annotations

import math
import os
import sys
import types

REFERENCE_ROOT = "/root/reference"


def load_reference_modeling():
    """Returns the reference's `modeling.make_model` module (CPU-runnable)."""
    if "pywt" not in sys.modules:
        try:
            import pywt  # noqa: F401
        except ImportError:
            pywt = types.ModuleType("pywt")

            class _HaarWavelet:
                def __init__(self, name: str):
                    if name != "haar":
                        raise NotImplementedError(
                            f"pywt stub only provides haar, got {name!r}")
                    s = 1.0 / math.sqrt(2.0)
                    self.dec_lo = [s, s]
                    self.dec_hi = [-s, s]
                    self.rec_lo = [s, s]
                    self.rec_hi = [s, -s]

            def dwt_coeff_len(data_len, filter_len, mode="zero"):
                # PyWavelets semantics (pywt/_functions.py): periodization
                # gives ceil(N/2), every other mode floor((N+L-1)/2).
                if hasattr(filter_len, "dec_lo"):
                    filter_len = len(filter_len.dec_lo)
                if mode in ("per", "periodization"):
                    return (data_len + 1) // 2
                return (data_len + filter_len - 1) // 2

            pywt.Wavelet = _HaarWavelet
            pywt.dwt_coeff_len = dwt_coeff_len
            sys.modules["pywt"] = pywt

    if "pkg_resources" not in sys.modules:
        try:
            import pkg_resources  # noqa: F401
        except ImportError:
            pr = types.ModuleType("pkg_resources")

            def resource_stream(pkg, name):
                # serve the reference package's own data files (DTCWT
                # coefficient .npz) so reference transforms run as oracles
                path = os.path.join(REFERENCE_ROOT, *pkg.split("."), name)
                return open(path, "rb")

            pr.resource_stream = resource_stream
            sys.modules["pkg_resources"] = pr

    # Cache the installed seaborn before the reference tree (which vendors
    # its own) lands at the front of sys.path.
    try:
        import seaborn  # noqa: F401
    except Exception:
        sys.modules.setdefault("seaborn", types.ModuleType("seaborn"))

    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    import importlib

    # `modeling/__init__.py` rebinds the `make_model` attribute to the
    # factory function; import_module returns the actual submodule.
    return importlib.import_module("modeling.make_model")


def load_reference_zoo():
    """Returns the reference ``basic_cnn_params`` package (the CNN zoo
    factory, reference modeling/backbones/basic_cnn_params/__init__.py) on
    CPU torch. The package imports itself absolutely
    (``from basic_cnn_params.xception import *``), so its parent directory
    goes on sys.path."""
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    backbones = f"{REFERENCE_ROOT}/modeling/backbones"
    if backbones not in sys.path:
        sys.path.insert(0, backbones)

    import importlib

    return importlib.import_module("basic_cnn_params")


class RefCfg:
    """Minimal stand-in for the reference yacs cfg (config/defaults.py)."""

    class MODEL:
        PRETRAIN_PATH_T = ""
        PRETRAIN_CHOICE = "random"
        TRANSFORMER_TYPE = "vit_base_patch16_224"
        ID_LOSS_TYPE = "softmax"
        SIE_CAMERA = True
        SIE_COE = 3.0
        STRIDE_SIZE = [16, 16]
        DROP_PATH = 0.0
        DROP_OUT = 0.0
        ATT_DROP_RATE = 0.0
        HEAD_KEEP = 2
        FREQUENCY_KEEP = 3
        AL = 0
        METRIC_LOSS_TYPE = "triplet"
        NO_MARGIN = True
        IF_LABELSMOOTH = "on"
        ID_LOSS_WEIGHT = 0.25
        TRIPLET_LOSS_WEIGHT = 1.0

    class INPUT:
        SIZE_TRAIN = [128, 64]

    class DATALOADER:
        SAMPLER = "softmax_triplet"

    class SOLVER:
        MARGIN = 0.3
        # optimizer-factory fields (reference solver/make_optimizer.py:5-29);
        # values mirror the reference RGBNT201 preset (configs/EDITOR.yml)
        BASE_LR = 0.001
        BIAS_LR_FACTOR = 2.0
        WEIGHT_DECAY = 1e-4
        WEIGHT_DECAY_BIAS = 1e-4
        MOMENTUM = 0.9
        LARGE_FC_LR = False
        OPTIMIZER_NAME = "SGD"
        CENTER_LR = 0.5


class DummyWriter:
    """No-op TensorBoard writer (EDITOR.forward logs num_count,
    reference make_model.py:201)."""

    def add_scalar(self, *a, **k):
        pass
