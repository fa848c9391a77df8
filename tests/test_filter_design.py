import numpy as np
import pytest

from dsptpu.filters.coefficients import (ZeroPoleGain, PolynomialRatio, Biquad,
                                         SecondOrderSections, coefb, coefa,
                                         as_zpk, as_sos, as_polynomial_ratio,
                                         as_biquad)
from dsptpu.filters.design import (Butterworth, Chebyshev1, Chebyshev2,
                                   Elliptic, Lowpass, Highpass, Bandpass,
                                   Bandstop, digitalfilter, analogfilter,
                                   bilinear, kaiserord, FIRWindow, iirnotch,
                                   resample_filter)
from dsptpu.ops.windows import hamming
from helpers import read_reference_data


def sortroots(r):
    r = np.asarray(r)
    return r[np.lexsort((np.imag(r), np.real(r)))]


def assert_zpk_close(f1, f2, rtol=1e-7, atol=1e-10):
    z1, z2 = sortroots(f1.z), sortroots(f2.z)
    p1, p2 = sortroots(f1.p), sortroots(f2.p)
    np.testing.assert_allclose(z1, z2, rtol=rtol, atol=atol)
    np.testing.assert_allclose(p1, p2, rtol=rtol, atol=atol)
    np.testing.assert_allclose(f1.k, f2.k, rtol=rtol, atol=atol)


# ---------------------------------------------------------------------------
# scipy cross-checks of the full IIR design chain
# ---------------------------------------------------------------------------

scipy_signal = pytest.importorskip("scipy.signal")


@pytest.mark.parametrize("n", [1, 2, 3, 4, 7, 8])
def test_butterworth_digital_vs_scipy(n):
    f = digitalfilter(Lowpass(0.4), Butterworth(n))
    z, p, k = scipy_signal.butter(n, 0.4, output="zpk")
    assert_zpk_close(f, ZeroPoleGain(z, p, k))


@pytest.mark.parametrize("kind,wn", [
    ("lowpass", 0.3), ("highpass", 0.55),
])
def test_butterworth_hp_vs_scipy(kind, wn):
    ftype = Lowpass(wn) if kind == "lowpass" else Highpass(wn)
    f = digitalfilter(ftype, Butterworth(5))
    z, p, k = scipy_signal.butter(5, wn, btype=kind, output="zpk")
    assert_zpk_close(f, ZeroPoleGain(z, p, k))


def test_butterworth_bp_bs_vs_scipy():
    f = digitalfilter(Bandpass(0.2, 0.4), Butterworth(4))
    z, p, k = scipy_signal.butter(4, [0.2, 0.4], btype="bandpass", output="zpk")
    assert_zpk_close(f, ZeroPoleGain(z, p, k))
    f = digitalfilter(Bandstop(0.2, 0.4), Butterworth(3))
    z, p, k = scipy_signal.butter(3, [0.2, 0.4], btype="bandstop", output="zpk")
    assert_zpk_close(f, ZeroPoleGain(z, p, k))


@pytest.mark.parametrize("n", [2, 3, 6])
def test_cheby1_vs_scipy(n):
    f = digitalfilter(Lowpass(0.3), Chebyshev1(n, 1.0))
    z, p, k = scipy_signal.cheby1(n, 1.0, 0.3, output="zpk")
    assert_zpk_close(f, ZeroPoleGain(z, p, k))


@pytest.mark.parametrize("n", [2, 3, 6])
def test_cheby2_vs_scipy(n):
    f = digitalfilter(Highpass(0.3), Chebyshev2(n, 40.0))
    z, p, k = scipy_signal.cheby2(n, 40.0, 0.3, btype="highpass", output="zpk")
    assert_zpk_close(f, ZeroPoleGain(z, p, k))


@pytest.mark.parametrize("n", [2, 3, 5, 8])
def test_elliptic_vs_scipy(n):
    f = digitalfilter(Lowpass(0.4), Elliptic(n, 0.5, 40.0))
    z, p, k = scipy_signal.ellip(n, 0.5, 40.0, 0.4, output="zpk")
    assert_zpk_close(f, ZeroPoleGain(z, p, k), rtol=1e-6, atol=1e-8)


def test_analog_butterworth():
    f = analogfilter(Lowpass(10.0), Butterworth(4))
    z, p, k = scipy_signal.butter(4, 10.0, analog=True, output="zpk")
    assert_zpk_close(f, ZeroPoleGain(z, p, k))


def test_design_validation():
    with pytest.raises(ValueError):
        Butterworth(0)
    with pytest.raises(ValueError):
        Chebyshev1(3, -1)
    with pytest.raises(ValueError):
        Elliptic(3, 2.0, 1.0)
    with pytest.raises(ValueError):
        digitalfilter(Lowpass(1.5), Butterworth(2))  # above Nyquist
    with pytest.raises(ValueError):
        Bandpass(0.4, 0.2)


# ---------------------------------------------------------------------------
# coefficient conversions
# ---------------------------------------------------------------------------

def test_tf_roundtrip():
    b = [1.0, 0.5, 0.25]
    a = [1.0, -0.3, 0.1]
    pr = PolynomialRatio(b, a)
    zpk = as_zpk(pr)
    pr2 = as_polynomial_ratio(zpk)
    np.testing.assert_allclose(coefb(pr2), b, atol=1e-12)
    np.testing.assert_allclose(coefa(pr2), a, atol=1e-12)


def test_tf_normalization():
    pr = PolynomialRatio([1, 2, 3], [2, 3, 4])
    np.testing.assert_allclose(pr.b, [0.5, 1.0, 1.5])
    np.testing.assert_allclose(pr.a, [1.0, 1.5, 2.0])
    with pytest.raises(ValueError):
        PolynomialRatio([1.0], [0.0, 1.0])


def test_sos_matches_scipy_zpk2sos_response():
    # the pairing differs from scipy's, but the cascaded response must match
    f = digitalfilter(Lowpass(0.2), Butterworth(7))
    sos = as_sos(f)
    arr = sos.sos_array()
    assert arr.shape == (4, 5)
    w = np.linspace(0, np.pi, 333)[1:]
    zв = np.exp(1j * w)
    resp = np.full_like(zв, sos.g, dtype=np.complex128)
    for b0, b1, b2, a1, a2 in arr:
        resp *= (b0 + b1 / zв + b2 / zв ** 2) / (1 + a1 / zв + a2 / zв ** 2)
    zz, pp, kk = scipy_signal.butter(7, 0.2, output="zpk")
    ref = kk * np.prod(zв[:, None] - zz[None, :], axis=1) / \
        np.prod(zв[:, None] - pp[None, :], axis=1)
    np.testing.assert_allclose(resp, ref, rtol=1e-7, atol=1e-9)
    # roundtrip back to zpk
    assert_zpk_close(as_zpk(sos), f, rtol=1e-6, atol=1e-8)


def test_biquad_conversions():
    bq = Biquad(0.5, 0.2, 0.1, -0.4, 0.3)
    pr = as_polynomial_ratio(bq)
    np.testing.assert_allclose(coefb(pr), [0.5, 0.2, 0.1])
    np.testing.assert_allclose(coefa(pr), [1.0, -0.4, 0.3])
    bq2 = as_biquad(pr)
    np.testing.assert_allclose(bq2.coefficients(), bq.coefficients())
    with pytest.raises(ValueError):
        as_biquad(PolynomialRatio([1, 2, 3, 4], [1, 0, 0, 0]))


def test_zpk_arithmetic():
    f = ZeroPoleGain([0.5], [0.1, 0.2], 2.0)
    g = f * 3.0
    assert g.k == 6.0
    h = f * f
    assert len(h.p) == 4 and h.k == 4.0
    inv = f.inv()
    np.testing.assert_allclose(inv.z, f.p)
    sq = f ** 2
    assert len(sq.p) == 4
    neg = f ** -1
    np.testing.assert_allclose(neg.k, 0.5)


# ---------------------------------------------------------------------------
# FIR design vs scipy-generated fixtures
# ---------------------------------------------------------------------------

FIR_CASES = [
    (Lowpass(0.25), 128, False, "digitalfilter_hamming_128_lowpass_fc0.25_fs1.0.txt"),
    (Lowpass(0.25), 129, False, "digitalfilter_hamming_129_lowpass_fc0.25_fs1.0.txt"),
    (Highpass(0.25), 129, False, "digitalfilter_hamming_129_highpass_fc0.25_fs1.0.txt"),
    (Bandpass(0.1, 0.2), 128, False, "digitalfilter_hamming_128_bandpass_fc0.1_0.2_fs1.0.txt"),
    (Bandpass(0.1, 0.2), 129, False, "digitalfilter_hamming_129_bandpass_fc0.1_0.2_fs1.0.txt"),
    (Bandstop(0.1, 0.2), 129, False, "digitalfilter_hamming_129_bandstop_fc0.1_0.2_fs1.0.txt"),
    (Lowpass(0.25), 128, True, "digitalfilter_hamming_128_lowpass_scaled_fc0.25_fs1.0.txt"),
    (Lowpass(0.25), 129, True, "digitalfilter_hamming_129_lowpass_scaled_fc0.25_fs1.0.txt"),
    (Highpass(0.25), 129, True, "digitalfilter_hamming_129_highpass_scaled_fc0.25_fs1.0.txt"),
    (Bandpass(0.1, 0.2), 128, True, "digitalfilter_hamming_128_bandpass_scaled_fc0.1_0.2_fs1.0.txt"),
    (Bandpass(0.1, 0.2), 129, True, "digitalfilter_hamming_129_bandpass_scaled_fc0.1_0.2_fs1.0.txt"),
    (Bandstop(0.1, 0.2), 129, True, "digitalfilter_hamming_129_bandstop_scaled_fc0.1_0.2_fs1.0.txt"),
]


@pytest.mark.parametrize("ftype,n,scale,fname", FIR_CASES,
                         ids=[c[3] for c in FIR_CASES])
def test_firwindow_fixture(ftype, n, scale, fname):
    taps = digitalfilter(ftype, FIRWindow.create(hamming(n), scale=scale), fs=1)
    ref = read_reference_data(fname)
    np.testing.assert_allclose(taps, ref, rtol=1e-10, atol=1e-12)


def test_firwindow_validation():
    with pytest.raises(ValueError):
        digitalfilter(Highpass(0.25), FIRWindow.create(hamming(128)), fs=1)
    with pytest.raises(ValueError):
        FIRWindow.create()


def test_kaiserord():
    n, alpha = kaiserord(0.05, 60)
    assert n > 100 and alpha > 0
    _, alpha_low = kaiserord(0.05, 10)
    assert alpha_low == 0.0
    # scipy comparison (beta convention: alpha = beta/pi)
    n_sp, beta_sp = scipy_signal.kaiserord(60, 0.05)
    assert abs(alpha * np.pi - beta_sp) < 1e-6


def test_iirnotch_vs_scipy():
    bq = iirnotch(0.25, 0.05)
    b, a = scipy_signal.iirnotch(0.25, 0.25 / 0.05)
    np.testing.assert_allclose([bq.b0, bq.b1, bq.b2], b, rtol=1e-9)
    np.testing.assert_allclose([1.0, bq.a1, bq.a2], a, rtol=1e-9)


def test_resample_filter_properties():
    from fractions import Fraction
    for num, den in [(1, 2), (2, 1), (2, 3), (3, 2), (147, 160)]:
        h = resample_filter(Fraction(num, den))
        # odd length, gain num at DC (lowpass scaled by interpolation factor)
        assert len(h) % 2 == 1
        np.testing.assert_allclose(np.sum(h), num, rtol=1e-9)
        # linear phase (symmetric taps)
        np.testing.assert_allclose(h, h[::-1], atol=1e-12)
    # arbitrary-rate variant: Nphi phases
    h = resample_filter(1.23456789, 32)
    np.testing.assert_allclose(np.sum(h), 32, rtol=1e-9)
