"""Dual-Tree Complex Wavelet Transform (DTCWT) and scattering layers.

TPU-native equivalent of the vendored pytorch_wavelets DTCWT/ScatterNet
(reference: pytorch_wavelets/dtcwt/transform2d.py, transform_funcs.py,
scatternet/layers.py — SURVEY.md §2.3). Implemented from the published
algorithm (Kingsbury, ACHA 2001; Selesnick/Baraniuk/Kingsbury, IEEE SPM
2005):

  * level 1: UNDECIMATED filtering with the odd biorthogonal near_sym_a pair
    (h0·g0 + h1·g1 = δ verified exactly), then the four 2×2 polyphase
    components of each subband become the four trees;
  * levels ≥ 2: per-tree critically-sampled banks with the 10-tap qshift_a
    orthogonal pair (tree B = time-reversed tree A → ∓¼-sample shifts),
    exact PR through the framework's zero-mode filter banks;
  * the (row-tree, col-tree) LH/HL/HH quartets combine into 6 oriented
    complex subbands z± = ((S_aa ∓ S_bb) + i(S_ab ± S_ba)) / 2.

Filter families: every reference-named family (near_sym_a/b, legall,
antonini; qshift_a/06/b/c/d) carries Kingsbury's published constant tables
— value-identical to the reference's dtcwt/data/*.npz (coeffs.py:1-125),
verified tap-for-tap and by f64 subband parity in
tests/test_dtcwt_extra_losses.py. Our own solutions to the same published
design problems remain available as the '*_derived' escape hatches (see
tools/design_dtcwt_filters.py). Complex bands are carried as a trailing
real/imag axis (no complex dtype on the TPU path).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from editor_tpu.ops import wavelets as W

Array = jax.Array

# ---------------------------------------------------------------------------
# Level-1 biorthogonal pairs, stored as (h0o, g0o) — analysis and synthesis
# lowpass, both odd length, normalized to sum(h0o) = 1 and half-band product
# (center of conv(h0o, g0o) = 1/2). The high filters follow from the
# alias-cancellation relations h1o[n] = (-1)^(n+1) g0o[n],
# g1o[n] = (-1)^n h0o[n] (center-aligned odd filters), which make
# conv(h0,g0) + conv(h1,g1) = δ exactly — asserted for every family in
# tests/test_dtcwt_extra_losses.py.
# Reference name surface: pytorch_wavelets/dtcwt/transform2d.py:24-28.
#   near_sym_a : Kingsbury's published (5,7) pair.
#   legall     : LeGall/CDF 5/3 spline pair (published table).
#   antonini   : CDF 9/7 / JPEG2000 pair (published table).
#   near_sym_b : Kingsbury's published (13,19) pair — the same constants
#     the reference's dtcwt/data/near_sym_b.npz ships (its h1o/g1o are
#     generated from these by exactly our alias relations, verified
#     tap-for-tap in tests/test_dtcwt_extra_losses.py).
#   near_sym_b_derived : our own same-length-class solution to the
#     published half-band design problem (order-8 Lagrange half-band
#     factored 6/10 zeros-at-π + reciprocal root groups), kept as the
#     documented escape hatch. Derivation: tools/design_dtcwt_filters.py.
# ---------------------------------------------------------------------------

_BIORT = {
    "near_sym_a": (
        np.array([-0.05, 0.25, 0.6, 0.25, -0.05]),
        np.array([-0.010714285714, -0.053571428571, 0.260714285714,
                  0.607142857143, 0.260714285714, -0.053571428571,
                  -0.010714285714]),
    ),
    "legall": (
        np.array([-1.0, 2.0, 6.0, 2.0, -1.0]) / 8.0,
        np.array([1.0, 2.0, 1.0]) / 4.0,
    ),
    "antonini": (
        np.array([0.026748757410810, -0.016864118442875,
                  -0.078223266528990, 0.266864118442875,
                  0.602949018236360, 0.266864118442875,
                  -0.078223266528990, -0.016864118442875,
                  0.026748757410810]),
        np.array([-0.045635881557125, -0.028771763114250,
                  0.295635881557125, 0.557543526228500,
                  0.295635881557125, -0.028771763114250,
                  -0.045635881557125]),
    ),
    "near_sym_b": (
        np.array([-1.757812500000000043e-03, 0.000000000000000000e+00,
                  2.226562500000000069e-02, -4.687500000000000000e-02,
                  -4.824218749999999861e-02, 2.968750000000000000e-01,
                  5.554687499999999556e-01, 2.968750000000000000e-01,
                  -4.824218749999999861e-02, -4.687500000000000000e-02,
                  2.226562500000000069e-02, 0.000000000000000000e+00,
                  -1.757812500000000043e-03]),
        np.array([7.062639508928570732e-05, 0.000000000000000000e+00,
                  -1.341901506696428466e-03, -1.883370535714285528e-03,
                  7.156808035714284574e-03, 2.385602678571428423e-02,
                  -5.564313616071427798e-02, -5.168805803571428076e-02,
                  2.997576032366071619e-01, 5.594308035714286031e-01,
                  2.997576032366071619e-01, -5.168805803571428076e-02,
                  -5.564313616071427798e-02, 2.385602678571428423e-02,
                  7.156808035714284574e-03, -1.883370535714285528e-03,
                  -1.341901506696428466e-03, 0.000000000000000000e+00,
                  7.062639508928570732e-05]),
    ),
    "near_sym_b_derived": (
        np.array([-0.006431960333496, -0.002007528553779, 0.030424257188960,
                  0.005037794843496, -0.003278967390054, 0.246969733710282,
                  0.458573341069181, 0.246969733710282, -0.003278967390054,
                  0.005037794843496, 0.030424257188960, -0.002007528553779,
                  -0.006431960333496]),
        np.array([4.969401100677041e-04, -1.551037955385900e-04,
                  -6.201865348864063e-03, 1.591270126280881e-03,
                  4.094543519443105e-02, 9.049823059807338e-03,
                  -1.521097237729034e-01, -1.085694810113402e-01,
                  3.668692138174096e-01, 6.961669832418635e-01,
                  3.668692138174096e-01, -1.085694810113402e-01,
                  -1.521097237729034e-01, 9.049823059807338e-03,
                  4.094543519443105e-02, 1.591270126280881e-03,
                  -6.201865348864063e-03, -1.551037955385900e-04,
                  4.969401100677041e-04]),
    ),
}


def biort_filters(biort) -> Tuple[np.ndarray, np.ndarray,
                                  np.ndarray, np.ndarray]:
    """(h0o, h1o, g0o, g1o) for a named level-1 family or an explicit
    (h0o, g0o) pair of odd-length lowpass filters."""
    if isinstance(biort, str):
        if biort not in _BIORT:
            raise ValueError(
                f"unknown biort '{biort}'; have {sorted(_BIORT)} or an "
                "explicit (h0o, g0o) tuple")
        h0, g0 = _BIORT[biort]
    else:
        h0, g0 = (np.asarray(f, np.float64) for f in biort)
    h1 = np.array([(-1.0) ** (n + 1) * g0[n] for n in range(len(g0))])
    g1 = np.array([(-1.0) ** n * h0[n] for n in range(len(h0))])
    return h0, h1, g0, g1


# ---------------------------------------------------------------------------
# Level-≥2 q-shift orthonormal banks, stored as the tree-A analysis lowpass
# h0a (even length 2N, quarter-sample group delay (2N-1)/2 - 1/4). Tree B is
# the time-reverse; the high filter is the conjugate mirror
# h1a[n] = (-1)^n h0a[2N-1-n]; synthesis = time-reverse (orthonormal bank).
# Reference name surface: transform2d.py:24-28 / dtcwt/data/qshift_*.npz.
# All five named families are Kingsbury's PUBLISHED tables (the same
# constants the reference's dtcwt/data/qshift_*.npz ship; the npz's 8
# per-tree filters are generated from h0a by exactly the relations below —
# verified tap-for-tap in tests/test_dtcwt_extra_losses.py). The
# '*_derived' variants are our own solutions to the same published design
# problem (ICIP 2003: stopband-energy minimization under double-shift
# orthonormality with the quarter-shift passband phase), kept as the
# documented escape hatch; derivation: tools/design_dtcwt_filters.py.
# ---------------------------------------------------------------------------

H0A = np.array([0.051130405284, -0.013975370247, -0.109836051666,
                0.263839561059, 0.766628467793, 0.563655710127,
                0.000873622695, -0.100231219507, -0.001689681273,
                -0.006181881892])

_QSHIFT = {
    "qshift_a": H0A,
    # Kingsbury's 6-tap bank stored in its length-10 layout (two zero taps
    # each side shift the quarter-delay to the length-10 alignment)
    "qshift_06": np.array([
        3.516383657149473735e-02, 0.000000000000000000e+00,
        -8.832942445107284934e-02, 2.338903206072356356e-01,
        7.602723690661257194e-01, 5.875182977235604564e-01,
        0.000000000000000000e+00, -1.143018371442487274e-01,
        0.000000000000000000e+00, 0.000000000000000000e+00,
    ]),
    "qshift_b": np.array([
        3.253142763653182022e-03, -3.883211999158490014e-03,
        3.466034684485348738e-02, -3.887280126882779185e-02,
        -1.172038876991152723e-01, 2.752953846688820372e-01,
        7.561456438925224788e-01, 5.688104207121227329e-01,
        1.186609203379699988e-02, -1.067118046866653985e-01,
        2.382538479492029779e-02, 1.702522388155398858e-02,
        -5.439475937274115130e-03, -4.556895628475491310e-03,
    ]),
    "qshift_c": np.array([
        -4.761611938455913469e-03, -4.460227892622851595e-04,
        -7.144197327965012053e-05, 3.491461230684219513e-02,
        -3.727389579989796170e-02, -1.159114574274407589e-01,
        2.763686431330317217e-01, 7.563937651990366717e-01,
        5.671344841001330073e-01, 1.463740596447334931e-02,
        -1.125588842575220294e-01, 2.228926326692270976e-02,
        1.849868272415624779e-02, -7.202677878258346468e-03,
        -2.276522058977717953e-04, 2.430349945148675087e-03,
    ]),
    "qshift_d": np.array([
        -2.284127440270530916e-03, 1.209894163073442323e-03,
        -1.183479451543078577e-02, 1.283456999344399427e-03,
        4.436522160661699604e-02, -5.327610880304726321e-02,
        -1.133058863621427964e-01, 2.809028632221864941e-01,
        7.528160380878561320e-01, 5.658080673964587248e-01,
        2.455015243366656316e-02, -1.201885447107948202e-01,
        1.815649394554645288e-02, 3.152637712208464921e-02,
        -6.628794612430062745e-03, -2.576174306600794751e-03,
        1.277558653806998160e-03, 2.411869456666277788e-03,
    ]),
    # ---- derived escape-hatch banks (our ICIP-2003-criterion solutions;
    # same lengths, exact orthonormal PR, numerically different taps) ----
    "qshift_06_derived": np.array([0.0, 0.0,
                                   -0.106806837268066, 0.224101018251215,
                                   0.833856332934947, 0.492510504389437,
                                   -0.019942726501489, -0.009504729432949,
                                   0.0, 0.0]),
    "qshift_b_derived": np.array([
        6.824825554648937e-05, 1.175083612887533e-02,
        1.866838701058983e-02, -3.991889002341913e-02,
        -9.986061743560468e-02, 2.647715682200098e-01,
        7.409323611217716e-01, 5.775798346335748e-01,
        5.118345225386201e-02, -1.645488851011748e-01,
        3.183316458695803e-02, 5.726487121237563e-02,
        -3.571821807497286e-02, 2.074495847030290e-04]),
    "qshift_c_derived": np.array([
        -0.012008725897470, -0.007352155718058,
        0.009726667754435, 0.042333508640379,
        -0.065577412799144, -0.103623293804070,
        0.287332627601471, 0.730897872351656,
        0.577980983606561, 0.046441315822014,
        -0.151974242118173, 0.012128799468230,
        0.072384251560065, -0.031289928783213,
        -0.010757360368728, 0.017570655057140]),
    "qshift_d_derived": np.array([
        -6.831074016002883e-04, -6.909412654047094e-03,
        -6.879131882386882e-03, 1.794269805121747e-02,
        2.885631157859396e-02, -5.517963931720012e-02,
        -9.777490761605788e-02, 2.805837773977339e-01,
        7.215053083833737e-01, 5.903886724717803e-01,
        5.136232679994033e-02, -1.634231891903228e-01,
        7.573719705530015e-03, 7.960627117737136e-02,
        -2.527319416285175e-02, -3.309268463172516e-02,
        2.841946865159687e-02, -2.809724987851015e-03]),
}


def qshift_filters(qshift) -> Tuple[np.ndarray, np.ndarray]:
    """(h0a, h1a) tree-A analysis pair for a named q-shift family or an
    explicit even-length h0a array."""
    if isinstance(qshift, str):
        if qshift not in _QSHIFT:
            raise ValueError(
                f"unknown qshift '{qshift}'; have {sorted(_QSHIFT)} or an "
                "explicit h0a array")
        h0a = _QSHIFT[qshift]
    else:
        h0a = np.asarray(qshift, np.float64)
    L = len(h0a)
    h1a = np.array([(-1.0) ** n * h0a[L - 1 - n] for n in range(L)])
    return h0a, h1a


# legacy qshift_a aliases (tree B = time-reverse of A; synthesis = reverse)
H1A = qshift_filters("qshift_a")[1]
H0B, H1B = H0A[::-1].copy(), H1A[::-1].copy()
G0A, G0B = H0A[::-1].copy(), H0A.copy()
G1A, G1B = H1A[::-1].copy(), H1A.copy()


def _qshift_bank(tree: str, h0a: np.ndarray = H0A,
                 h1a: np.ndarray = H1A):
    h0, h1 = (h0a, h1a) if tree == "a" else (h0a[::-1], h1a[::-1])
    # orthogonal bank: dec = reversed impulse response, rec = impulse response
    return (h0[::-1].copy(), h1[::-1].copy(), h0.copy(), h1.copy())


def _filter_same(x: Array, f: np.ndarray, axis: int) -> Array:
    """Centered stride-1 correlation with an odd-length filter (symmetric
    border extension, like the reference's colfilter/rowfilter)."""
    L = len(f)
    xp = W._pad_axis(x, axis, L // 2, L // 2, "symmetric")
    k = jnp.asarray(f.reshape(1, L), x.dtype)
    y = W._grouped_conv_axis(xp, k, axis, stride=1)
    return y[..., 0]


_TREES = (("a", "a"), ("a", "b"), ("b", "a"), ("b", "b"))


_INV_SQRT2 = 1.0 / np.sqrt(2.0)

# orientation slots in the [15,45,75,105,135,165]-degree output order the
# reference uses (dtcwt/transform_funcs q2c stacking): each quartet's two
# conjugate orientations land symmetric about the middle
_ORI = {"lh": (0, 5), "hl": (2, 3), "hh": (1, 4)}


def _q2c(bands4: dict) -> List[Array]:
    """4 tree subbands → 2 complex orientations (stacked real/imag), in the
    reference's convention (value-identical to DTCWTForward: 1/√2 scale,
    second orientation conjugated — asserted in
    tests/test_dtcwt_extra_losses.py)."""
    aa, ab = bands4[("a", "a")], bands4[("a", "b")]
    ba, bb = bands4[("b", "a")], bands4[("b", "b")]
    s = _INV_SQRT2
    z1 = jnp.stack([(aa - bb) * s, (ab + ba) * s], axis=-1)
    z2 = jnp.stack([(aa + bb) * s, (ba - ab) * s], axis=-1)
    return [z1, z2]


def _c2q(z1: Array, z2: Array) -> dict:
    s = _INV_SQRT2
    return {
        ("a", "a"): (z1[..., 0] + z2[..., 0]) * s,
        ("b", "b"): (z2[..., 0] - z1[..., 0]) * s,
        ("a", "b"): (z1[..., 1] - z2[..., 1]) * s,
        ("b", "a"): (z1[..., 1] + z2[..., 1]) * s,
    }


def _stack_ori(pairs: dict) -> Array:
    """{'lh'/'hl'/'hh': [z1, z2]} → [..., 6, 2] in 15..165-degree order."""
    slots = [None] * 6
    for b, (i1, i2) in _ORI.items():
        slots[i1], slots[i2] = pairs[b]
    return jnp.stack(slots, axis=-2)


def _unstack_ori(hb: Array) -> dict:
    """Inverse of _stack_ori: per-band quartets from the [..., 6, 2] stack."""
    return {b: _c2q(hb[..., i1, :], hb[..., i2, :])
            for b, (i1, i2) in _ORI.items()}


def _phase(x: Array, tr: str, tc: str) -> Array:
    """2×2 polyphase component: rows (H) phase = col-tree, cols (W) = row-tree."""
    pr = 0 if tc == "a" else 1
    pc = 0 if tr == "a" else 1
    return x[:, pr::2, pc::2]


def _interleave(phases: dict) -> Array:
    """Inverse of _phase: reassemble the full-resolution tensor."""
    aa = phases[("a", "a")]
    B, h, w, C = aa.shape
    out = jnp.zeros((B, 2 * h, 2 * w, C), aa.dtype)
    for (tr, tc), v in phases.items():
        pr = 0 if tc == "a" else 1
        pc = 0 if tr == "a" else 1
        out = out.at[:, pr::2, pc::2].set(v)
    return out


# ---------------------------------------------------------------------------
# symmetric-extension double-rate filters (reference dtcwt/lowlevel.py:97-223
# coldfilt/rowdfilt/colifilt/rowifilt + utils.py:166 symm_pad_1d): level-≥2
# banks that keep subbands at exact powers of two — Kingsbury's scheme where
# the two trees are the two phases of one double-rate symmetric filter pair.
# ---------------------------------------------------------------------------

def _symm_idx(l: int, m: int) -> np.ndarray:
    """Half-sample symmetric extension indices over [-m, l+m) (reference
    utils.py reflect/symm_pad_1d)."""
    x = np.arange(-m, l + m, dtype=np.int64)
    rng = l
    mod = np.fmod(x + 0.5, 2 * rng)
    mod = np.where(mod < 0, mod + 2 * rng, mod)
    out = np.where(mod >= rng, 2 * rng - mod, mod) - 0.5
    return np.round(out + 0.0).astype(np.int64)


def _take(x: Array, idx: np.ndarray, axis: int) -> Array:
    return jnp.take(x, jnp.asarray(idx), axis=axis)


def _corr1(x: Array, taps: np.ndarray, axis: int, stride: int = 1) -> Array:
    k = jnp.asarray(np.asarray(taps, np.float64).reshape(1, -1), x.dtype)
    return W._grouped_conv_axis(x, k, axis, stride=stride)[..., 0]


def _ilv(parts: Sequence[Array], axis: int) -> Array:
    """Interleave equal-shape tensors along ``axis`` (phase reassembly)."""
    y = jnp.stack(parts, axis=axis + 1)
    shp = list(parts[0].shape)
    shp[axis] *= len(parts)
    return y.reshape(shp)


def _dfilt(x: Array, ha: np.ndarray, hb: np.ndarray, axis: int,
           highpass: bool) -> Array:
    """Decimating double-rate filter along ``axis`` (reference coldfilt/
    rowdfilt): symmetric extension, ha on one polyphase stream, hb on the
    other, interleaved back — N → N/2 exactly (N % 4 == 0)."""
    r = x.shape[axis]
    if r % 4:
        raise ValueError(f"extent {r} along axis {axis} must be divisible "
                         "by 4 for the symmetric qshift bank")
    m = len(ha)
    xe = _symm_idx(r, m)
    y1 = _corr1(_take(x, xe[2::2], axis), ha[::-1], axis, stride=2)
    y2 = _corr1(_take(x, xe[3::2], axis), hb[::-1], axis, stride=2)
    pair = (y2, y1) if highpass else (y1, y2)
    return _ilv(pair, axis)


def _ifilt(x: Array, ha: np.ndarray, hb: np.ndarray, axis: int,
           highpass: bool) -> Array:
    """Interpolating double-rate filter (reference colifilt/rowifilt):
    N → 2N via four polyphase branches of the even/odd taps."""
    r = x.shape[axis]
    if r % 2:
        raise ValueError(f"extent {r} along axis {axis} must be even")
    m = len(ha)
    m2 = m // 2
    har, hbr = np.asarray(ha)[::-1], np.asarray(hb)[::-1]
    hao, hae = har[1::2], har[::2]
    hbo, hbe = hbr[1::2], hbr[::2]
    xe = _symm_idx(r, m2)
    if m2 % 2 == 0:
        ks = (hae, hbe, hao, hbo)
        if highpass:
            streams = (xe[1:-2:2], xe[:-2:2], xe[3::2], xe[2::2])
        else:
            streams = (xe[:-2:2], xe[1:-2:2], xe[2::2], xe[3::2])
    else:
        ks = (hao, hbo, hae, hbe)
        if highpass:
            streams = (xe[2:-1:2], xe[1:-1:2], xe[2:-1:2], xe[1:-1:2])
        else:
            streams = (xe[1:-1:2], xe[2:-1:2], xe[1:-1:2], xe[2:-1:2])
    parts = [_corr1(_take(x, s, axis), k, axis) for s, k in zip(streams, ks)]
    return _ilv(parts, axis)


def dtcwt2(x: Array, J: int = 2, mode: str = "zero",
           biort="near_sym_a",
           qshift="qshift_a") -> Tuple[List[Array], List[Array]]:
    """Forward 2D DTCWT of NHWC ``x`` (even H and W).

    Returns:
      lows: 4 per-tree lowpass tensors at the coarsest scale (kept separate
        so the inverse is exact).
      highs: per level j, [B, H/2^j, W/2^j, C, 6, 2] oriented complex bands.

    ``mode``: level-≥2 border handling. 'zero' (zero-extension per-tree
    banks — subbands grow by the filter length at each level); 'symmetric'
    (the reference default, transform2d.py/lowlevel.py:97-223: symmetric
    double-rate banks keeping every subband at exactly half the previous
    extent — requires extents divisible by 4 at each level).

    ``biort`` / ``qshift``: level-1 / level-≥2 filter families (reference
    transform2d.py:24-28 name surface) — see ``biort_filters`` /
    ``qshift_filters`` for names and explicit-array escape hatches.
    """
    H0O, H1O, _, _ = biort_filters(biort)
    h0a, h1a = qshift_filters(qshift)
    # tree B = time-reverse of tree A (the quarter-shift construction)
    H0B, H1B = h0a[::-1], h1a[::-1]
    # level 1: undecimated near_sym filtering, then polyphase split
    lo_w = _filter_same(x, H0O, axis=2)
    hi_w = _filter_same(x, H1O, axis=2)
    full = {
        "ll": _filter_same(lo_w, H0O, axis=1),
        "lh": _filter_same(lo_w, H1O, axis=1),
        "hl": _filter_same(hi_w, H0O, axis=1),
        "hh": _filter_same(hi_w, H1O, axis=1),
    }
    highs = [_stack_ori({b: _q2c({t: _phase(full[b], *t) for t in _TREES})
                         for b in ("lh", "hl", "hh")})]

    if mode == "symmetric":
        # interleaved-quad representation (the reference keeps all four
        # trees as the 2x2 phases of one tensor through every level)
        ll = full["ll"]
        for j in range(2, J + 1):
            lo = _dfilt(ll, H0B, h0a, axis=2, highpass=False)
            hi = _dfilt(ll, H1B, h1a, axis=2, highpass=True)
            lh = _dfilt(lo, H1B, h1a, axis=1, highpass=True)
            hl = _dfilt(hi, H0B, h0a, axis=1, highpass=False)
            hh = _dfilt(hi, H1B, h1a, axis=1, highpass=True)
            ll = _dfilt(lo, H0B, h0a, axis=1, highpass=False)
            highs.append(_stack_ori(
                {n: _q2c({t: _phase(band, *t) for t in _TREES})
                 for n, band in (("lh", lh), ("hl", hl), ("hh", hh))}))
        return [_phase(ll, *t) for t in _TREES], highs

    lows = {t: _phase(full["ll"], *t) for t in _TREES}
    for j in range(2, J + 1):
        subs = {}
        for t in _TREES:
            fr = _qshift_bank(t[0], h0a, h1a)
            fc = _qshift_bank(t[1], h0a, h1a)
            lo_w2, hi_w2 = W.afb1d(lows[t], fr, axis=2, mode="zero")
            ll, lh = W.afb1d(lo_w2, fc, axis=1, mode="zero")
            hl, hh = W.afb1d(hi_w2, fc, axis=1, mode="zero")
            lows[t] = ll
            subs[t] = (lh, hl, hh)
        highs.append(_stack_ori(
            {n: _q2c({t: subs[t][b] for t in _TREES})
             for b, n in enumerate(("lh", "hl", "hh"))}))
    return [lows[t] for t in _TREES], highs


def idtcwt2(lows: Sequence[Array], highs: Sequence[Array],
            mode: str = "zero", biort="near_sym_a",
            qshift="qshift_a") -> Array:
    """Inverse 2D DTCWT (exact in the interior; symmetric-border effects at
    level 1 only). ``mode``/``biort``/``qshift`` must match the forward's."""
    _, _, G0O, G1O = biort_filters(biort)
    h0a, h1a = qshift_filters(qshift)
    # synthesis = time-reverse of analysis (orthonormal bank); tree B = the
    # time-reverse of tree A
    G0A, G0B = h0a[::-1], h0a
    G1A, G1B = h1a[::-1], h1a
    J = len(highs)
    lows = {t: lows[i] for i, t in enumerate(_TREES)}
    if mode == "symmetric":
        ll = _interleave(lows)
        for j in range(J, 1, -1):
            quads = _unstack_ori(highs[j - 1])
            lh, hl, hh = (_interleave(quads[b]) for b in ("lh", "hl", "hh"))
            hi = (_ifilt(hh, G1B, G1A, axis=1, highpass=True)
                  + _ifilt(hl, G0B, G0A, axis=1, highpass=False))
            lo = (_ifilt(lh, G1B, G1A, axis=1, highpass=True)
                  + _ifilt(ll, G0B, G0A, axis=1, highpass=False))
            ll = (_ifilt(hi, G1B, G1A, axis=2, highpass=True)
                  + _ifilt(lo, G0B, G0A, axis=2, highpass=False))
        lows = {t: _phase(ll, *t) for t in _TREES}
    else:
        for j in range(J, 1, -1):
            quads = _unstack_ori(highs[j - 1])
            bands_by_tree = {
                t: [quads[b][t] for b in ("lh", "hl", "hh")] for t in _TREES}
            for t in _TREES:
                fr = _qshift_bank(t[0], h0a, h1a)
                fc = _qshift_bank(t[1], h0a, h1a)
                lh, hl, hh = bands_by_tree[t]
                ll = lows[t]
                for ax in (1, 2):
                    if ll.shape[ax] > lh.shape[ax]:
                        ll = jax.lax.slice_in_dim(ll, 0, lh.shape[ax],
                                                  axis=ax)
                lo_w = W.sfb1d(ll, lh, fc, axis=1, mode="zero")
                hi_w = W.sfb1d(hl, hh, fc, axis=1, mode="zero")
                lows[t] = W.sfb1d(lo_w, hi_w, fr, axis=2, mode="zero")

    # level 1: reassemble full-resolution subbands, undecimated inverse
    quads = _unstack_ori(highs[0])
    full = {"ll": _interleave(lows)}
    for b in ("lh", "hl", "hh"):
        full[b] = _interleave(quads[b])
    lo_w = (_filter_same(full["ll"], G0O, axis=1)
            + _filter_same(full["lh"], G1O, axis=1))
    hi_w = (_filter_same(full["hl"], G0O, axis=1)
            + _filter_same(full["hh"], G1O, axis=1))
    return _filter_same(lo_w, G0O, axis=2) + _filter_same(hi_w, G1O, axis=2)


def dtcwt_magnitude(highs: Array, eps: float = 0.0) -> Array:
    """|z| of a [..., 6, 2] oriented band tensor → [..., 6]."""
    return jnp.sqrt(jnp.sum(jnp.square(highs), axis=-1) + eps)


# ---------------------------------------------------------------------------
# Scattering layers (reference: pytorch_wavelets/scatternet/layers.py —
# ScatLayer / ScatLayerj2: lowpass + complex-magnitudes of the oriented
# bands, spatially downsampled; magnitudes are smooth and
# translation-quasi-invariant)
# ---------------------------------------------------------------------------

def _smooth_mag(highs: Array, bias: float) -> Array:
    """sqrt(re² + im² + bias²) − bias — the reference's smoothed magnitude
    (scatternet/lowlevel.py ScatLayer*_f, magbias=1e-2: differentiable at
    zero, bias-corrected)."""
    return jnp.sqrt(jnp.sum(jnp.square(highs), axis=-1) + bias * bias) - bias


def _avgpool2(x: Array) -> Array:
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0


def scat_layer(x: Array, magbias: float = 1e-2) -> Array:
    """First-order scattering: [B,H,W,C] → [B,H/2,W/2,C*7]
    (tree-averaged lowpass ‖ 6 orientation magnitudes)
    (reference ScatLayer, scatternet/layers.py)."""
    lows, highs = dtcwt2(x, J=1)
    low = sum(lows) / 4.0  # [B,H/2,W/2,C]
    mag = _smooth_mag(highs[0], magbias)  # [B,H/2,W/2,C,6]
    B, h, w, C, O = mag.shape
    return jnp.concatenate([low, mag.reshape(B, h, w, C * O)], axis=-1)


def scat_layer_j2(x: Array, magbias: float = 1e-2) -> Array:
    """Second-order two-scale scattering: [B,H,W,C] → [B,H/4,W/4,C*49].

    reference ScatLayerj2 (scatternet/layers.py / lowlevel.py
    ScatLayerj2_f): unlike ScatLayer∘ScatLayer, the second SCALE uses the
    proper q-shift filters (the reference's fwd_j2plus — here level 2 of
    dtcwt2), and the output stacks exactly the reference's terms:
      [ s0 (J=2 lowpass, C) | s1_j1 (level-1 magnitudes avg-pooled, 6C) |
        s1_j2 (level-2 magnitudes, 6C) | s2_j1 (second-order magnitudes of
        the level-1 magnitude images, 36C) ].
    """
    B, H, Wd, C = x.shape
    # symmetric mode (the reference default): level-2 subbands land at
    # exactly H/4 x W/4, so all four term groups align with no crop
    mode = "symmetric" if H % 8 == 0 and Wd % 8 == 0 else "zero"
    lows, highs = dtcwt2(x, J=2, mode=mode)
    s0 = sum(lows) / 4.0                               # [B, H/4, W/4, C]
    m1 = _smooth_mag(highs[0], magbias)                # [B, H/2, W/2, C, 6]
    h2, w2 = m1.shape[1:3]
    s1_j1_img = m1.reshape(B, h2, w2, C * 6)
    s1_j2 = _smooth_mag(highs[1], magbias)             # [B, H/4, W/4, C, 6]
    # second order: scatter the level-1 magnitude images one more level
    _, highs2 = dtcwt2(s1_j1_img, J=1)
    s2_j1 = _smooth_mag(highs2[0], magbias)            # [B,H/4,W/4,6C,6]
    s1_j1 = _avgpool2(s1_j1_img)                       # [B, H/4, W/4, 6C]
    parts = [
        s0,
        s1_j1,
        s1_j2.reshape(B, s1_j2.shape[1], s1_j2.shape[2], C * 6),
        s2_j1.reshape(B, s2_j1.shape[1], s2_j1.shape[2], C * 36),
    ]
    # level-2 outputs carry a few rows/cols of q-shift filter growth; the
    # growth is symmetric, so CENTER-crop every term to the smallest common
    # extent (a top-left crop would spatially shift the larger terms by
    # half the growth relative to s0/s1)
    h4 = min(p.shape[1] for p in parts)
    w4 = min(p.shape[2] for p in parts)

    def _center(p):
        dh = (p.shape[1] - h4) // 2
        dw = (p.shape[2] - w4) // 2
        return p[:, dh:dh + h4, dw:dw + w4]

    return jnp.concatenate([_center(p) for p in parts], axis=-1)
