"""ULP-level IIR design accuracy against arbitrary-precision oracles.

Port of the reference's accuracy methodology
(test/FilterTestHelpers.jl:41-87, test/filter_design.jl): the same
design algorithms are evaluated in 60-digit mpmath arithmetic to
produce an "accurate" zpk; the float64 design's per-element error in
ULPs must be no worse than a small multiple of scipy's (the reference
compares DSP.jl vs hardcoded scipy/MATLAB designs the same way).
Covers butter/cheby1/cheby2/ellip prototypes, LP/HP/BP/BS transforms,
and the bilinear digital designs up to order 20.
"""

import numpy as np
import pytest

mp = pytest.importorskip("mpmath").mp
import mpmath
from scipy import signal as sp

import dsptpu
from dsptpu.filters.design import (Butterworth, Chebyshev1, Chebyshev2,
                                   Elliptic, Lowpass, Highpass, Bandpass,
                                   Bandstop, digitalfilter)
from dsptpu.filters.coefficients import as_zpk

mp.dps = 60
ONE = mp.mpf(1)


# ---------------------------------------------------------------------------
# mpmath oracle: same algorithms, 60-digit arithmetic
# ---------------------------------------------------------------------------

def mp_butter(n):
    p = []
    for i in range(1, n // 2 + 1):
        w = mp.mpf(2 * i - 1) / (2 * n)
        up = -mp.sin(mp.pi * w) + 1j * mp.cos(mp.pi * w)
        p += [up, mp.conj(up)]
    if n % 2 == 1:
        p.append(mp.mpc(-1))
    return [], p, ONE


def _mp_cheb_poles(n, eps):
    mu = mp.asinh(1 / eps) / n
    b, c = -mp.sinh(mu), mp.cosh(mu)
    p = []
    for i in range(1, n // 2 + 1):
        w = mp.mpf(2 * i - 1) / (2 * n)
        up = b * mp.sin(mp.pi * w) + 1j * c * mp.cos(mp.pi * w)
        p += [up, mp.conj(up)]
    if n % 2 == 1:
        w = mp.mpf(2 * (n // 2) + 1) / (2 * n)
        p.append(mp.mpc(b * mp.sin(mp.pi * w)))
    return p


def mp_cheby1(n, ripple):
    eps = mp.sqrt(mp.mpf(10) ** (mp.mpf(ripple) / 10) - 1)
    p = _mp_cheb_poles(n, eps)
    k = ONE
    for i in range(n // 2):
        k *= abs(p[2 * i + 1]) ** 2
    if n % 2 == 0:
        k /= mp.sqrt(1 + eps ** 2)
    else:
        k *= -p[-1].real
    return [], p, k


def mp_cheby2(n, ripple):
    eps = 1 / mp.sqrt(mp.mpf(10) ** (mp.mpf(ripple) / 10) - 1)
    p = [1 / c for c in _mp_cheb_poles(n, eps)]
    z = []
    k = ONE
    for i in range(n // 2):
        w = mp.mpf(2 * (i + 1) - 1) / (2 * n)
        ze = -1j / mp.cos(mp.pi * w)
        z += [ze, mp.conj(ze)]
        k *= abs(p[2 * i + 1]) ** 2 / abs(ze) ** 2
    if n % 2 == 1:
        k *= -p[-1].real
    return z, p, k


def _mp_landen(k, niter=12):
    seq = []
    for _ in range(niter):
        k = (k / (1 + mp.sqrt(1 - k * k))) ** 2
        seq.append(k)
    return seq


def _mp_from_init(init, seq):
    winv = 1 / init
    for x in seq[::-1]:
        winv = (winv + x / winv) / (1 + x)
    return 1 / winv


def _mp_cde(u, seq):
    return _mp_from_init(mp.cos(mp.pi * u / 2), seq)


def _mp_sne(u, seq):
    return _mp_from_init(mp.sin(mp.pi * u / 2), seq)


def _mp_asne(w, k):
    oldw = None
    for _ in range(200):
        if oldw is not None and w == oldw:
            break
        oldw = w
        kold = k
        k = (k / (1 + mp.sqrt(1 - k * k))) ** 2
        w = 2 * w / ((1 + k) * (1 + mp.sqrt(1 - kold ** 2 * w ** 2)))
    return 2 * mp.asin(w) / mp.pi


def mp_ellip(n, rp, rs):
    eps_p = mp.sqrt(mp.mpf(10) ** (mp.mpf(rp) / 10) - 1)
    eps_s = mp.sqrt(mp.mpf(10) ** (mp.mpf(rs) / 10) - 1)
    k1 = eps_p / eps_s
    k1p_sq = 1 - k1 * k1
    k1p = mp.sqrt(k1p_sq)
    seq1 = _mp_landen(k1p)
    kp = ONE
    for i in range(1, n // 2 + 1):
        kp *= _mp_sne(mp.mpf(2 * i - 1) / n, seq1)
    kp = k1p_sq ** (mp.mpf(n) / 2) * kp ** 4
    k = mp.sqrt(1 - kp * kp)
    seq = _mp_landen(k)
    v0 = (-1j / n * _mp_asne(1j / eps_p, k1)).real
    z, p = [], []
    gain = ONE
    for i in range(1, n // 2 + 1):
        w = mp.mpf(2 * i - 1) / n
        ze = -1j / (k * _mp_cde(w, seq))
        z += [ze, mp.conj(ze)]
        pole = 1j * _mp_cde(w - 1j * v0, seq)
        p += [mp.conj(pole), pole]
        gain *= abs(pole) ** 2 / abs(ze) ** 2
    if n % 2 == 1:
        pole = 1j * _mp_sne(1j * v0, seq)
        p.append(pole)
        gain *= abs(pole)
    else:
        gain *= mp.mpf(10) ** (-mp.mpf(rp) / 20)
    return z, p, gain


def mp_transform(kind, z, p, k, w1, w2=None):
    """LP prototype -> LP/HP/BP/BS at mpmath precision (sftrans)."""
    if kind == "lp":
        return ([w1 * c for c in z], [w1 * c for c in p],
                k * w1 ** (len(p) - len(z)))
    if kind == "hp":
        num = mp.fprod([-c for c in z]) if z else ONE
        den = mp.fprod([-c for c in p]) if p else ONE
        nmax = max(len(z), len(p))
        newz = [w1 / c for c in z] + [mp.mpc(0)] * (nmax - len(z))
        newp = [w1 / c for c in p] + [mp.mpc(0)] * (nmax - len(p))
        return newz, newp, k * (num / den).real
    bw = w2 - w1
    prod_w = w1 * w2
    if kind == "bp":
        def bp_map(cs):
            out = []
            for c in cs:
                b = c * bw / 2
                pm = mp.sqrt(b * b - prod_w)
                out += [b + pm, b - pm]
            return out
        newz = bp_map(z) + [mp.mpc(0)] * (len(p) - min(len(z), len(p)))
        newp = bp_map(p)
        return newz, newp, k * bw ** (len(p) - len(z))
    if kind == "bs":
        num = mp.fprod([-c for c in z]) if z else ONE
        den = mp.fprod([-c for c in p]) if p else ONE
        npairs = max(len(z), len(p))
        npm = mp.sqrt(mp.mpc(-prod_w))

        def bs_map(cs):
            out = []
            for c in cs:
                b = (bw / 2) / c
                pm = mp.sqrt(b * b - prod_w)
                out += [b - pm, b + pm]
            return out
        newz = bs_map(z) + [-npm, npm] * (npairs - len(z))
        newp = bs_map(p) + [-npm, npm] * (npairs - len(p))
        return newz, newp, k * (num / den).real
    raise ValueError(kind)


def mp_bilinear(z, p, k, fs):
    nz, npoles = len(z), len(p)
    newz = [(2 + c / fs) / (2 - c / fs) for c in z]
    newz += [mp.mpc(-1)] * (npoles - nz)
    newp = [(2 + c / fs) / (2 - c / fs) for c in p]
    num = mp.fprod([2 * fs - c for c in z]) if nz else ONE
    den = mp.fprod([2 * fs - c for c in p]) if npoles else ONE
    return newz, newp, k * (num / den).real


def mp_digital(kind, proto_fn, edges):
    z, p, k = proto_fn()
    warped = [4 * mp.tan(mp.pi * mp.mpf(e) / 2) for e in edges]
    z, p, k = mp_transform(kind, z, p, k, *warped)
    return mp_bilinear(z, p, k, 2)


# ---------------------------------------------------------------------------
# ULP loss (FilterTestHelpers.jl:41-45)
# ---------------------------------------------------------------------------

def _sortkey(c):
    return (mp.re(c), mp.im(c))


def ulp_loss(vals, accurate):
    """Sum over elements of |x - acc| / eps(acc) for real and imag."""
    vals = sorted([mp.mpc(complex(v)) for v in np.atleast_1d(vals)],
                  key=_sortkey)
    accurate = sorted([mp.mpc(c) for c in accurate], key=_sortkey)
    assert len(vals) == len(accurate)
    total = mp.mpf(0)
    for v, a in zip(vals, accurate):
        for part in (mp.re, mp.im):
            x, acc = part(v), part(a)
            ulp = mp.mpf(np.spacing(abs(float(x))) or np.spacing(1.0))
            total += abs(x - acc) / ulp
    return float(total)


def check(ours, others, accurate_zpk, relerr=4.0, slack=8.0):
    """our ULP error must be <= relerr * scipy's + slack per element
    (reference accuracy_check semantics, relerr loosened to allow
    implementation-noise ties)."""
    z_acc, p_acc, k_acc = accurate_zpk
    zo, po, ko = others
    f = as_zpk(ours)
    n = max(len(p_acc), 1)
    err_p = ulp_loss(f.p, p_acc)
    err_p_sp = ulp_loss(po, p_acc)
    assert err_p <= relerr * err_p_sp + slack * n, \
        f"poles: ours {err_p:.1f} ULP vs scipy {err_p_sp:.1f} ULP"
    if len(z_acc):
        err_z = ulp_loss(f.z, z_acc)
        err_z_sp = ulp_loss(zo, z_acc)
        assert err_z <= relerr * err_z_sp + slack * n, \
            f"zeros: ours {err_z:.1f} ULP vs scipy {err_z_sp:.1f} ULP"
    err_k = ulp_loss([f.k], [k_acc])
    err_k_sp = ulp_loss([ko], [k_acc])
    assert err_k <= relerr * err_k_sp + slack * n, \
        f"gain: ours {err_k:.1f} ULP vs scipy {err_k_sp:.1f} ULP"


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

ORDERS = [4, 8, 13, 20]


class TestPrototypeAccuracy:
    @pytest.mark.parametrize("n", ORDERS)
    def test_butterworth(self, n):
        z, p, k = mp_butter(n)
        zs, ps, ks = sp.buttap(n)
        check(Butterworth(n), (zs, ps, ks), (z, p, k))

    @pytest.mark.parametrize("n", ORDERS)
    def test_cheby1(self, n):
        z, p, k = mp_cheby1(n, 0.5)
        zs, ps, ks = sp.cheb1ap(n, 0.5)
        check(Chebyshev1(n, 0.5), (zs, ps, ks), (z, p, k))

    @pytest.mark.parametrize("n", ORDERS)
    def test_cheby2(self, n):
        z, p, k = mp_cheby2(n, 40)
        zs, ps, ks = sp.cheb2ap(n, 40)
        check(Chebyshev2(n, 40), (zs, ps, ks), (z, p, k))

    @pytest.mark.parametrize("n", [4, 8, 13, 19])
    def test_elliptic(self, n):
        z, p, k = mp_ellip(n, 0.5, 60)
        zs, ps, ks = sp.ellipap(n, 0.5, 60)
        check(Elliptic(n, 0.5, 60), (zs, ps, ks), (z, p, k))


class TestDigitalAccuracy:
    """End-to-end digital designs vs the mpmath pipeline; scipy's
    butter/cheby/ellip as the comparison design (reference
    filter_design.jl's matched-scipy cases)."""

    @pytest.mark.parametrize("n", ORDERS)
    def test_butter_lowpass(self, n):
        acc = mp_digital("lp", lambda: mp_butter(n), [0.3])
        zs, ps, ks = sp.butter(n, 0.3, output="zpk")
        ours = digitalfilter(Lowpass(0.3), Butterworth(n))
        check(ours, (zs, ps, ks), acc)

    @pytest.mark.parametrize("n", [4, 8, 13])
    def test_cheby1_highpass(self, n):
        acc = mp_digital("hp", lambda: mp_cheby1(n, 1.0), [0.4])
        zs, ps, ks = sp.cheby1(n, 1.0, 0.4, btype="highpass", output="zpk")
        ours = digitalfilter(Highpass(0.4), Chebyshev1(n, 1.0))
        check(ours, (zs, ps, ks), acc)

    @pytest.mark.parametrize("n", [4, 8, 10])
    def test_cheby2_bandpass(self, n):
        acc = mp_digital("bp", lambda: mp_cheby2(n, 50), [0.2, 0.5])
        zs, ps, ks = sp.cheby2(n, 50, [0.2, 0.5], btype="bandpass",
                               output="zpk")
        ours = digitalfilter(Bandpass(0.2, 0.5), Chebyshev2(n, 50))
        check(ours, (zs, ps, ks), acc)

    @pytest.mark.parametrize("n", [4, 8, 10])
    def test_ellip_bandstop(self, n):
        acc = mp_digital("bs", lambda: mp_ellip(n, 0.5, 60), [0.25, 0.55])
        zs, ps, ks = sp.ellip(n, 0.5, 60, [0.25, 0.55], btype="bandstop",
                              output="zpk")
        ours = digitalfilter(Bandstop(0.25, 0.55), Elliptic(n, 0.5, 60))
        check(ours, (zs, ps, ks), acc)
