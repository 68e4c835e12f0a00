"""2D/1D discrete wavelet transforms as XLA convolutions (TPU-native).

Re-designed equivalent of the vendored ``pytorch_wavelets`` DWT
(reference: pytorch_wavelets/dwt/lowlevel.py:91-275, transform2d.py:7-149):
analysis = grouped strided correlation with reversed decomposition filters;
synthesis = input-dilated correlation with reversed reconstruction filters
(== torch conv_transpose2d semantics). Padding modes: zero, symmetric,
reflect, periodization.

Layout is NHWC (TPU-native; the reference uses NCHW). Band order within a
level is ``(detail_H, detail_W, detail_diag)`` stacked on a new trailing
axis — the same subband set as pytorch_wavelets' ``yh[:, :, 0:3]``.

Fast path: for ``haar`` + ``zero`` padding + even extents (the EDITOR main
path: Frequency.py:13-14 uses J=4 haar/zero on 256x128 crops) the zero-mode
pad length is 0 and the filter bank degenerates to exact pairwise
average/difference — implemented as a reshape + add/sub, which XLA fuses into
a handful of VPU ops instead of 8 grouped convolutions per level.

Filter coefficients are the standard public Daubechies/symlet values (same
values pywt ships); pywt itself is not a dependency.
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

SQRT2_INV = 1.0 / math.sqrt(2.0)

# scaling (rec_lo) filters; everything else derived by QMF relations
_REC_LO: Dict[str, List[float]] = {
    "haar": [SQRT2_INV, SQRT2_INV],
    "db1": [SQRT2_INV, SQRT2_INV],
    "db2": [0.48296291314469025, 0.836516303737469,
            0.22414386804185735, -0.12940952255092145],
    "db3": [0.3326705529509569, 0.8068915093133388, 0.4598775021193313,
            -0.13501102001039084, -0.08544127388224149, 0.035226291882100656],
    "db4": [0.23037781330885523, 0.7148465705525415, 0.6308807679295904,
            -0.02798376941698385, -0.18703481171888114, 0.030841381835986965,
            0.032883011666982945, -0.010597401784997278],
    "sym2": [0.48296291314469025, 0.836516303737469,
             0.22414386804185735, -0.12940952255092145],
    "sym4": [0.03222310060404270, -0.012603967262037833, -0.09921954357684722,
             0.29785779560527736, 0.8037387518059161, 0.49761866763201545,
             -0.02963552764599851, -0.07576571478927333],
    # coiflets (standard published values, e.g. Daubechies "Ten Lectures"
    # table 8.1 — verified by the orthonormality/vanishing-moment/PR
    # property suite in tests/test_wavelets.py)
    "coif1": [-0.01565572813546454, -0.0727326195128539, 0.38486484686420286,
              0.8525720202122554, 0.3378976624578092, -0.0727326195128539],
    "coif2": [-0.000720549445364512, -0.0018232088707029932,
              0.0056114348193944995, 0.023680171946334084,
              -0.0594344186464569, -0.0764885990783064, 0.41700518442169254,
              0.8127236354455423, 0.3861100668211622, -0.06737255472196302,
              -0.04146493678175915, 0.016387336463522112],
}

# biorthogonal families as (dec_lo, rec_lo) in the pywt zero-padded layout;
# the hi filters follow from the biorthogonal alternating-sign relations
# (dec_hi[n] = (-1)^(n+1) rec_lo[n], rec_hi[n] = (-1)^n dec_lo[n] — opposite
# parities, the alias-cancellation condition; PR through afb1d/sfb1d is
# asserted in tests/test_wavelets.py).
# bior2.2 is the LeGall/CDF 5/3 pair and bior4.4 the CDF 9/7 (Antonini/
# JPEG2000) pair, both x sqrt(2) — the same published spline-wavelet tables
# the DTCWT level-1 'legall'/'antonini' options use (ops/dtcwt.py).
_S2 = math.sqrt(2.0)
_BIOR: Dict[str, Tuple[List[float], List[float]]] = {
    "bior1.1": ([SQRT2_INV, SQRT2_INV], [SQRT2_INV, SQRT2_INV]),
    "bior1.3": ([-1 / (8 * _S2), 1 / (8 * _S2), SQRT2_INV, SQRT2_INV,
                 1 / (8 * _S2), -1 / (8 * _S2)],
                [0.0, 0.0, SQRT2_INV, SQRT2_INV, 0.0, 0.0]),
    "bior2.2": ([0.0, -0.125 * _S2, 0.25 * _S2, 0.75 * _S2, 0.25 * _S2,
                 -0.125 * _S2],
                [0.0, 0.25 * _S2, 0.5 * _S2, 0.25 * _S2, 0.0, 0.0]),
    "bior4.4": ([0.0,
                 0.026748757410810106 * _S2, -0.01686411844287467 * _S2,
                 -0.07822326652899052 * _S2, 0.2668641184428749 * _S2,
                 0.6029490182363593 * _S2, 0.2668641184428749 * _S2,
                 -0.07822326652899052 * _S2, -0.01686411844287467 * _S2,
                 0.026748757410810106 * _S2],
                [0.0,
                 -0.045635881557125636 * _S2, -0.028771763114250094 * _S2,
                 0.2956358815571257 * _S2, 0.5575435262285023 * _S2,
                 0.2956358815571257 * _S2, -0.028771763114250094 * _S2,
                 -0.045635881557125636 * _S2, 0.0, 0.0]),
}


def daubechies_rec_lo(N: int) -> np.ndarray:
    """Derive the order-N Daubechies scaling filter (2N taps) by spectral
    factorization — the textbook construction, no coefficient tables:
    P(y) = Σ_{k<N} C(N-1+k, k) y^k; its z-domain roots pair (z, 1/z);
    keeping the |z| < 1 roots (minimum phase = the standard db family)
    against the ((1+z)/2)^N spline factor and normalizing to Σh = sqrt(2)
    reproduces pywt's db1..dbN to ~1e-10 (asserted vs the embedded db2-4
    values in tests/test_wavelets.py)."""
    if N < 1:
        raise ValueError("db order must be >= 1")
    if N == 1:
        return np.asarray([SQRT2_INV, SQRT2_INV])
    from math import comb
    # P(y) coefficients, highest degree first for np.roots
    P = np.asarray([comb(N - 1 + k, k) for k in range(N)], np.float64)[::-1]
    yroots = np.roots(P)
    zroots = []
    for y in yroots:
        # y = (2 - z - 1/z)/4  =>  z^2 - (2 - 4y) z + 1 = 0
        b = 2.0 - 4.0 * y
        disc = np.sqrt(b * b - 4.0 + 0j)
        for z in ((b + disc) / 2.0, (b - disc) / 2.0):
            if abs(z) < 1.0 - 1e-12:
                zroots.append(z)
    # h(z) = ((1+z)/2)^N * prod (z - z_i) / (normalization)
    h = np.asarray([1.0 + 0j])
    for _ in range(N):
        h = np.convolve(h, [0.5, 0.5])
    for z in zroots:
        h = np.convolve(h, [1.0, -z])
    h = np.real(h)
    h *= math.sqrt(2.0) / h.sum()
    # standard db ordering starts with the largest-magnitude end first
    if abs(h[0]) < abs(h[-1]):
        h = h[::-1]
    return h.copy()


def wavelet_filters(wave) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Returns (dec_lo, dec_hi, rec_lo, rec_hi) float64 arrays (pywt
    convention). ``wave`` may be: an explicit 4-tuple of coefficient arrays
    (the DTCWT's q-shift banks use this escape hatch), an orthogonal family
    name (haar, db1..db20 — db5+ derived by spectral factorization — sym2,
    sym4, coif1, coif2), or a biorthogonal name (bior1.1/1.3/2.2/4.4)
    (reference name surface: pytorch_wavelets/dwt/transform2d.py:22-26
    reaches any pywt wavelet by name)."""
    if isinstance(wave, tuple):
        return tuple(np.asarray(f, np.float64) for f in wave)
    if wave in _BIOR:
        dec_lo = np.asarray(_BIOR[wave][0], np.float64)
        rec_lo = np.asarray(_BIOR[wave][1], np.float64)
        sgn = np.asarray([(-1.0) ** (n + 1) for n in range(len(dec_lo))])
        return dec_lo, sgn * rec_lo, rec_lo, -sgn * dec_lo
    if wave in _REC_LO:
        rec_lo = np.asarray(_REC_LO[wave], dtype=np.float64)
    elif wave.startswith("db") and wave[2:].isdigit() and int(wave[2:]) <= 20:
        rec_lo = daubechies_rec_lo(int(wave[2:]))
    else:
        raise ValueError(
            f"unknown wavelet '{wave}'; have {sorted(_REC_LO)}, "
            f"{sorted(_BIOR)}, db1..db20, or an explicit filter 4-tuple")
    L = len(rec_lo)
    # qmf: rec_hi[n] = (-1)^n rec_lo[L-1-n]
    rec_hi = np.array([(-1) ** n * rec_lo[L - 1 - n] for n in range(L)])
    dec_lo = rec_lo[::-1].copy()
    dec_hi = rec_hi[::-1].copy()
    return dec_lo, dec_hi, rec_lo, rec_hi


def dwt_coeff_len(n: int, filt_len: int, mode: str) -> int:
    """pywt.dwt_coeff_len for non-periodization modes; per mode halves."""
    if mode in ("per", "periodization"):
        return (n + 1) // 2
    return (n + filt_len - 1) // 2


# ---------------------------------------------------------------------------
# 1D filter banks along H or W of an NHWC tensor
# ---------------------------------------------------------------------------

def _pad_axis(x: Array, axis: int, before: int, after: int, mode: str) -> Array:
    pads = [(0, 0)] * x.ndim
    pads[axis] = (before, after)
    if mode == "zero":
        return jnp.pad(x, pads)
    if mode == "symmetric":
        return jnp.pad(x, pads, mode="symmetric")
    if mode == "reflect":
        return jnp.pad(x, pads, mode="reflect")
    if mode in ("per", "periodization", "periodic"):
        return jnp.pad(x, pads, mode="wrap")
    raise ValueError(f"unknown pad mode '{mode}'")


def _grouped_conv_axis(x: Array, kernels: Array, axis: int, stride: int,
                       lhs_dilation: int = 1, rhs_dilation: int = 1) -> Array:
    """Correlate each channel of NHWC ``x`` with K 1-D kernels along ``axis``.

    kernels: [K, L]. Returns [..., C, K] stacked on a new trailing axis.
    ``rhs_dilation`` dilates the KERNEL (à trous); ``lhs_dilation`` the input.
    """
    B, H, W, C = x.shape
    K, L = kernels.shape
    if axis == 1:
        kern = kernels.T.reshape(L, 1, 1, K)   # HWIO with I=1
        kern = jnp.tile(kern, (1, 1, 1, C))    # O = C*K group-major: [c0k0,c0k1,c1k0,...]
        window_strides = (stride, 1)
        ld = (lhs_dilation, 1)
        rd = (rhs_dilation, 1)
    elif axis == 2:
        kern = kernels.T.reshape(1, L, 1, K)
        kern = jnp.tile(kern, (1, 1, 1, C))
        window_strides = (1, stride)
        ld = (1, lhs_dilation)
        rd = (1, rhs_dilation)
    else:
        raise ValueError(axis)
    y = jax.lax.conv_general_dilated(
        x, kern.astype(x.dtype), window_strides=window_strides,
        padding="VALID", lhs_dilation=ld, rhs_dilation=rd,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
        precision=jax.lax.Precision.HIGHEST,
    )
    # grouped output channel layout: [c0k0, c0k1, ..., c1k0, ...]
    Bo, Ho, Wo, _ = y.shape
    return y.reshape(Bo, Ho, Wo, C, K)


def afb1d(x: Array, wave: str, axis: int, mode: str = "zero") -> Tuple[Array, Array]:
    """1D analysis bank along ``axis`` (1=H, 2=W) of NHWC ``x``.

    Returns (lo, hi), each NHWC with the filtered axis halved.
    Mirrors reference afb1d (pytorch_wavelets/dwt/lowlevel.py:91-172).
    """
    dec_lo, dec_hi, _, _ = wavelet_filters(wave)
    L = len(dec_lo)
    N = x.shape[axis]
    # correlation with reversed dec filters (reference reverses then conv2d)
    kernels = jnp.asarray(np.stack([dec_lo[::-1], dec_hi[::-1]]), dtype=x.dtype)
    if mode in ("per", "periodization"):
        if N % 2 == 1:
            idx = [slice(None)] * x.ndim
            idx[axis] = slice(N - 1, N)
            x = jnp.concatenate([x, x[tuple(idx)]], axis=axis)
            N += 1
        x = jnp.roll(x, -(L // 2), axis=axis)
        # torch conv2d(padding=L-1) zero-pads BOTH sides (lowlevel.py:142-143)
        x = _pad_axis(x, axis, L - 1, L - 1, "zero")
        y = _grouped_conv_axis(x, kernels, axis, stride=2)
        n2 = N // 2
        l2 = L // 2
        if l2 > 0:
            head = jax.lax.slice_in_dim(y, 0, l2, axis=axis)
            wrap = jax.lax.slice_in_dim(y, n2, n2 + l2, axis=axis)
            rest = jax.lax.slice_in_dim(y, l2, n2, axis=axis)
            y = jnp.concatenate([head + wrap, rest], axis=axis)
        y = jax.lax.slice_in_dim(y, 0, n2, axis=axis)
    else:
        outsize = dwt_coeff_len(N, L, mode)
        p = 2 * (outsize - 1) - N + L
        if mode == "zero":
            if p % 2 == 1:
                x = _pad_axis(x, axis, 0, 1, "zero")
            x = _pad_axis(x, axis, p // 2, p // 2, "zero")
        else:
            x = _pad_axis(x, axis, p // 2, (p + 1) // 2, mode)
        y = _grouped_conv_axis(x, kernels, axis, stride=2)
    return y[..., 0], y[..., 1]


def sfb1d(lo: Array, hi: Array, wave: str, axis: int, mode: str = "zero") -> Array:
    """1D synthesis bank: inverse of afb1d (reference: lowlevel.py:226-273).

    conv_transpose(stride 2, padding L-2) == dilate-by-2 + correlate with the
    reversed reconstruction filter with pad (L-1)-(L-2)=1 ... generalized below.
    """
    _, _, rec_lo, rec_hi = wavelet_filters(wave)
    L = len(rec_lo)
    p = L - 2  # torch conv_transpose 'padding' (crop) used by the reference
    edge = L - 1 - p  # == 1
    k_lo = jnp.asarray(rec_lo[::-1].copy(), dtype=lo.dtype).reshape(1, L)
    k_hi = jnp.asarray(rec_hi[::-1].copy(), dtype=hi.dtype).reshape(1, L)
    if mode in ("per", "periodization"):
        n = lo.shape[axis]
        ylo = _pad_axis(lo, axis, 0, 0, "zero")
        y = (_sfb_conv(ylo, k_lo, axis, L - 1) + _sfb_conv(hi, k_hi, axis, L - 1))
        N = 2 * n
        if L - 2 > 0:
            head = jax.lax.slice_in_dim(y, 0, L - 2, axis=axis)
            wrap = jax.lax.slice_in_dim(y, N, N + L - 2, axis=axis)
            rest = jax.lax.slice_in_dim(y, L - 2, N, axis=axis)
            y = jnp.concatenate([head + wrap, rest], axis=axis)
        y = jax.lax.slice_in_dim(y, 0, N, axis=axis)
        y = jnp.roll(y, 1 - L // 2, axis=axis)
        return y
    return _sfb_conv(lo, k_lo, axis, edge) + _sfb_conv(hi, k_hi, axis, edge)


def _sfb_conv(x: Array, kernel: Array, axis: int, edge_pad: int) -> Array:
    """Dilate-by-2 then correlate, padding the dilated signal by ``edge_pad``."""
    pads_needed = edge_pad
    xp = x
    C = xp.shape[3]
    K, L = kernel.shape
    if axis == 1:
        kern = kernel.T.reshape(L, 1, 1, 1)
        kern = jnp.tile(kern, (1, 1, 1, C))
        padding = [(pads_needed, pads_needed), (0, 0)]
        ld = (2, 1)
    else:
        kern = kernel.T.reshape(1, L, 1, 1)
        kern = jnp.tile(kern, (1, 1, 1, C))
        padding = [(0, 0), (pads_needed, pads_needed)]
        ld = (1, 2)
    y = jax.lax.conv_general_dilated(
        xp, kern.astype(x.dtype), window_strides=(1, 1), padding=padding,
        lhs_dilation=ld, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C, precision=jax.lax.Precision.HIGHEST,
    )
    return y


# ---------------------------------------------------------------------------
# 2D single level
# ---------------------------------------------------------------------------

def afb2d(x: Array, wave: str, mode: str = "zero") -> Tuple[Array, Array]:
    """One analysis level. Returns (ll, bands) with bands [B,h,w,C,3] ordered
    (detail_H, detail_W, detail_diag)."""
    lo_w, hi_w = afb1d(x, wave, axis=2, mode=mode)
    ll, lh = afb1d(lo_w, wave, axis=1, mode=mode)
    hl, hh = afb1d(hi_w, wave, axis=1, mode=mode)
    bands = jnp.stack([lh, hl, hh], axis=-1)
    return ll, bands


def sfb2d(ll: Array, bands: Array, wave: str, mode: str = "zero") -> Array:
    """Inverse of afb2d."""
    lh, hl, hh = bands[..., 0], bands[..., 1], bands[..., 2]
    # crop ll if one larger than the bands (odd-length bookkeeping, reference
    # transform2d.py DWTInverse.forward)
    for ax in (1, 2):
        if ll.shape[ax] > lh.shape[ax]:
            ll = jax.lax.slice_in_dim(ll, 0, lh.shape[ax], axis=ax)
    lo_w = sfb1d(ll, lh, wave, axis=1, mode=mode)
    hi_w = sfb1d(hl, hh, wave, axis=1, mode=mode)
    return sfb1d(lo_w, hi_w, wave, axis=2, mode=mode)


# ---------------------------------------------------------------------------
# stationary (undecimated / à trous) transform
# ---------------------------------------------------------------------------

def _afb1d_atrous(x: Array, kernels: Array, axis: int, mode: str,
                  dilation: int) -> Array:
    """1D à trous analysis along ``axis``: no downsampling, kernel dilated by
    ``dilation`` (reference afb1d_atrous, pytorch_wavelets/dwt/
    lowlevel.py:175-223: pad (L2-dilation, L2) then dilated grouped conv)."""
    L = kernels.shape[1]
    L2 = L * dilation // 2
    x = _pad_axis(x, axis, L2 - dilation, L2, mode)
    return _grouped_conv_axis(x, kernels, axis, stride=1,
                              rhs_dilation=dilation)


def swt2(x: Array, wave: str = "haar", J: int = 1,
         mode: str = "periodic") -> List[Tuple[Array, Array]]:
    """2D stationary wavelet transform (reference SWTForward,
    pytorch_wavelets/dwt/transform2d.py:151-210 over afb2d_atrous,
    lowlevel.py:475-520).

    Returns a list of J levels of ``(ll, bands)``; every output keeps the
    full [B,H,W,C] extent (undecimated), bands stacked [B,H,W,C,3] in the
    same (detail_H, detail_W, detail_diag) order as :func:`wavedec2`. Level
    j uses filters dilated by 2**j on the previous level's ``ll``.

    ``mode``: 'periodic' (wrap — the working equivalent of the reference's
    'periodization' default, whose vendored mypad cannot actually pad),
    'zero', 'symmetric' or 'reflect'.
    """
    dec_lo, dec_hi, _, _ = wavelet_filters(wave)
    kernels = jnp.asarray(np.stack([dec_lo[::-1], dec_hi[::-1]]),
                          dtype=x.dtype)
    ll = x
    out = []
    for j in range(J):
        d = 2 ** j
        B, H, W, C = ll.shape
        lohi = _afb1d_atrous(ll, kernels, 2, mode, d)          # [B,H,W,C,2]
        y = _afb1d_atrous(lohi.reshape(B, H, W, C * 2), kernels, 1, mode, d)
        y = y.reshape(B, H, W, C, 2, 2)      # [..., C, W-band, H-band]
        ll = y[..., 0, 0]
        bands = jnp.stack([y[..., 0, 1], y[..., 1, 0], y[..., 1, 1]],
                          axis=-1)
        out.append((ll, bands))
    return out


def _sfb1d_atrous(lo: Array, hi: Array, wave, axis: int, mode: str,
                  dilation: int) -> Array:
    """1D à trous synthesis along ``axis``: undo :func:`_afb1d_atrous`.

    Equivalent of the reference ``sfb1d_atrous``
    (pytorch_wavelets/dwt/swt_inverse.py:1-77) re-derived for correctness —
    the reference's shipped ``SWTInverse.forward`` separable path actually
    calls the DECIMATED ``sfb2d`` on undecimated coefficients
    (swt_inverse.py:198-201), so it cannot reconstruct; this is the working
    à-trous synthesis bank.

    Math: the analysis pads ``(L2 - d, L2)`` and correlates with the
    reversed dec filters (kernel dilation d), i.e. Y(z) = z^{L2} H(z^d) X(z)
    with L2 = L·d/2. Synthesis pads the MIRROR ``(L2, L2 - d)`` and
    correlates with the reversed rec filters, contributing
    z^{(L-1)d - L2} G(z^d); summing both bands gives
    z^{(L-1)d}·[G0·H0 + G1·H1](z^d)·X(z) = 2·X(z) by the undecimated PR
    identity G0(z)H0(z) + G1(z)H1(z) = 2·z^{-(L-1)} — so halving the sum is
    an exact, shift-free inverse. Boundary: exact everywhere for periodic
    padding; for zero/symmetric the truncated analysis drops coefficients
    outside [0, N), so reconstruction is exact only beyond an ``L·d`` border
    (asserted in tests/test_wavelets.py).
    """
    _, _, rec_lo, rec_hi = wavelet_filters(wave)
    L = len(rec_lo)
    d = dilation
    L2 = L * d // 2
    k_lo = jnp.asarray(rec_lo[::-1].copy(), dtype=lo.dtype).reshape(1, L)
    k_hi = jnp.asarray(rec_hi[::-1].copy(), dtype=hi.dtype).reshape(1, L)
    lo_p = _pad_axis(lo, axis, L2, L2 - d, mode)
    hi_p = _pad_axis(hi, axis, L2, L2 - d, mode)
    y = (_grouped_conv_axis(lo_p, k_lo, axis, stride=1, rhs_dilation=d)[..., 0]
         + _grouped_conv_axis(hi_p, k_hi, axis, stride=1,
                              rhs_dilation=d)[..., 0])
    return y * 0.5


def _sfb2d_atrous(ll: Array, bands: Array, wave, mode: str,
                  dilation: int) -> Array:
    """One 2D à trous synthesis level: inverse of one :func:`swt2` level
    (reference sfb2d_atrous, swt_inverse.py:80-124). ``bands`` is the
    [B,H,W,C,3] (detail_H, detail_W, detail_diag) stack."""
    lh, hl, hh = bands[..., 0], bands[..., 1], bands[..., 2]
    lo_w = _sfb1d_atrous(ll, lh, wave, axis=1, mode=mode, dilation=dilation)
    hi_w = _sfb1d_atrous(hl, hh, wave, axis=1, mode=mode, dilation=dilation)
    return _sfb1d_atrous(lo_w, hi_w, wave, axis=2, mode=mode,
                         dilation=dilation)


def iswt2(coeffs: Sequence[Tuple[Array, Array]], wave: str = "haar",
          mode: str = "periodic") -> Array:
    """Inverse 2D stationary wavelet transform: reconstructs ``x`` from
    :func:`swt2`'s output (reference ``SWTInverse``,
    pytorch_wavelets/dwt/swt_inverse.py:126-213 — whose shipped separable
    path is non-functional, see :func:`_sfb1d_atrous`).

    ``coeffs``: the full J-level ``[(ll, bands), ...]`` list from
    :func:`swt2` (only the deepest ``ll`` and every level's ``bands`` are
    consumed, matching the (yl, yh) contract of the reference). Perfect
    reconstruction for ``mode='periodic'`` (the :func:`swt2` default); for
    zero/symmetric the border of ``L * 2**J`` pixels is approximate (the
    truncated analysis is not information-preserving there).
    """
    coeffs = list(coeffs)
    ll = coeffs[-1][0]
    for j in reversed(range(len(coeffs))):
        ll = _sfb2d_atrous(ll, coeffs[j][1], wave, mode, dilation=2 ** j)
    return ll


# ---------------------------------------------------------------------------
# fast Haar path (zero mode, even extents)
# ---------------------------------------------------------------------------

def _haar_afb2d_fast(x: Array) -> Tuple[Array, Array]:
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    a = x[:, :, 0, :, 0]
    b = x[:, :, 0, :, 1]
    c = x[:, :, 1, :, 0]
    d = x[:, :, 1, :, 1]
    ll = (a + b + c + d) * 0.5
    lh = (a + b - c - d) * 0.5  # detail along H
    hl = (a - b + c - d) * 0.5  # detail along W
    hh = (a - b - c + d) * 0.5
    return ll, jnp.stack([lh, hl, hh], axis=-1)


def _haar_sfb2d_fast(ll: Array, bands: Array) -> Array:
    lh, hl, hh = bands[..., 0], bands[..., 1], bands[..., 2]
    a = (ll + lh + hl + hh) * 0.5
    b = (ll + lh - hl - hh) * 0.5
    c = (ll - lh + hl - hh) * 0.5
    d = (ll - lh - hl + hh) * 0.5
    B, h, w, C = ll.shape
    y = jnp.stack([jnp.stack([a, b], axis=3), jnp.stack([c, d], axis=3)], axis=2)
    # y: [B, h, 2(H sub), w, 2(W sub), C]
    return y.reshape(B, 2 * h, 2 * w, C)


def _haar_fast_ok(shape, wave: str, mode: str) -> bool:
    return (wave in ("haar", "db1") and mode == "zero"
            and shape[1] % 2 == 0 and shape[2] % 2 == 0)


# ---------------------------------------------------------------------------
# multi-level API (DWTForward / DWTInverse equivalents)
# ---------------------------------------------------------------------------

def wavedec2(x: Array, wave: str = "haar", J: int = 1,
             mode: str = "zero") -> Tuple[Array, List[Array]]:
    """Multi-level 2D DWT of NHWC ``x``; equivalent of reference DWTForward
    (pytorch_wavelets/dwt/transform2d.py:7-75). Returns (lowpass, [bands_j])."""
    highs: List[Array] = []
    ll = x
    for _ in range(J):
        if _haar_fast_ok(ll.shape, wave, mode):
            ll, bands = _haar_afb2d_fast(ll)
        else:
            ll, bands = afb2d(ll, wave, mode)
        highs.append(bands)
    return ll, highs


def waverec2(ll: Array, highs: Sequence[Array], wave: str = "haar",
             mode: str = "zero") -> Array:
    """Inverse multi-level 2D DWT; equivalent of reference DWTInverse
    (pytorch_wavelets/dwt/transform2d.py:77-149)."""
    for bands in reversed(list(highs)):
        if (_haar_fast_ok((0, 2 * bands.shape[1], 2 * bands.shape[2]), wave, mode)
                and ll.shape[1] == bands.shape[1] and ll.shape[2] == bands.shape[2]):
            ll = _haar_sfb2d_fast(ll, bands)
        else:
            ll = sfb2d(ll, bands, wave, mode)
    return ll


# ---------------------------------------------------------------------------
# 1D multi-level API (DWT1DForward/Inverse equivalents,
# pytorch_wavelets/dwt/transform1d.py)
# ---------------------------------------------------------------------------

def wavedec1(x: Array, wave: str = "haar", J: int = 1,
             mode: str = "zero") -> Tuple[Array, List[Array]]:
    """x: [B, N, C] → (lowpass, [high_j])."""
    lo = x[:, :, None, :]  # NHWC with W=1... filter along axis 1
    highs = []
    for _ in range(J):
        lo, hi = afb1d(lo, wave, axis=1, mode=mode)
        highs.append(hi[:, :, 0, :])
    return lo[:, :, 0, :], highs


def waverec1(lo: Array, highs: Sequence[Array], wave: str = "haar",
             mode: str = "zero") -> Array:
    y = lo[:, :, None, :]
    for hi in reversed(list(highs)):
        hiw = hi[:, :, None, :]
        if y.shape[1] > hiw.shape[1]:
            y = y[:, : hiw.shape[1]]
        y = sfb1d(y, hiw, wave, axis=1, mode=mode)
    return y[:, :, 0, :]
