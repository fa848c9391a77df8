"""Filter response tests (reference test/filter_response.jl strategy:
scipy oracles + analytic identities)."""

import numpy as np
from scipy import signal as sp

from dsptpu.filters import (PolynomialRatio, Biquad, digitalfilter,
                            Butterworth, Lowpass, Highpass, as_sos, as_zpk)
from dsptpu.filters.response import (freqresp, phaseresp, grpdelay, impresp,
                                     stepresp)


def test_freqresp_matches_scipy():
    b, a = sp.butter(4, 0.3)
    w = np.linspace(0, np.pi, 128)
    got = freqresp(PolynomialRatio(b, a), w)
    _, want = sp.freqz(b, a, worN=w)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_freqresp_forms_agree():
    f = digitalfilter(Lowpass(0.2), Butterworth(6))
    w = np.linspace(0, np.pi, 64)
    from dsptpu.filters import as_polynomial_ratio
    h_zpk = freqresp(f, w)
    h_sos = freqresp(as_sos(f), w)
    h_pr = freqresp(as_polynomial_ratio(f), w)
    np.testing.assert_allclose(h_sos, h_zpk, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(h_pr, h_zpk, rtol=1e-6, atol=1e-9)


def test_freqresp_default_grid():
    f = digitalfilter(Lowpass(0.25), Butterworth(2))
    H, w = freqresp(f)
    assert len(w) == 257 and w[0] == 0 and np.isclose(w[-1], np.pi)
    assert abs(H[0]) > 0.99  # unity DC gain lowpass


def test_analog_freqresp():
    # Butterworth prototype: |H(jw)|^2 = 1/(1+w^(2n))
    proto = Butterworth(3)
    w = np.array([0.1, 1.0, 10.0])
    H = freqresp(proto, w)
    np.testing.assert_allclose(np.abs(H), 1 / np.sqrt(1 + w ** 6), rtol=1e-10)


def test_phaseresp_linear_phase_fir():
    b = sp.firwin(21, 0.4)
    w = np.linspace(0.01, 2.0, 50)
    phi = phaseresp(PolynomialRatio(b, [1.0]), w)
    # linear-phase FIR: phase = -w * (n-1)/2 in the passband
    np.testing.assert_allclose(phi[:20], -w[:20] * 10, atol=1e-6)


def test_grpdelay_matches_scipy():
    b, a = sp.butter(5, 0.2)
    w = np.linspace(0.01, np.pi - 0.01, 64)
    got = grpdelay(PolynomialRatio(b, a), w)
    _, want = sp.group_delay((b, a), w=w)
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_grpdelay_linear_phase_shortcut():
    b = sp.firwin(33, 0.3)
    w = np.linspace(0, np.pi, 16)
    got = grpdelay(PolynomialRatio(b, [1.0]), w)
    np.testing.assert_allclose(got, 16.0)


def test_grpdelay_analog():
    proto = Butterworth(2)
    w = np.linspace(0.1, 3, 40)
    got = grpdelay(proto, w)
    # numerical derivative of the unwrapped phase
    dw = 1e-6
    phi1 = np.angle(freqresp(proto, w - dw))
    phi2 = np.angle(freqresp(proto, w + dw))
    want = -(np.unwrap(phi2) - np.unwrap(phi1)) / (2 * dw)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_impresp_stepresp():
    b, a = sp.butter(3, 0.4)
    f = PolynomialRatio(b, a)
    imp = np.asarray(impresp(f, 64))
    np.testing.assert_allclose(imp, sp.lfilter(b, a, np.eye(64)[0]),
                               atol=1e-12)
    step = np.asarray(stepresp(f, 64))
    np.testing.assert_allclose(step, sp.lfilter(b, a, np.ones(64)),
                               atol=1e-12)
    np.testing.assert_allclose(np.cumsum(imp), step, atol=1e-10)


def test_biquad_freqresp():
    bq = Biquad(0.2, 0.1, 0.05, -0.3, 0.4)
    w = np.linspace(0, np.pi, 32)
    got = freqresp(bq, w)
    _, want = sp.freqz([0.2, 0.1, 0.05], [1, -0.3, 0.4], worN=w)
    np.testing.assert_allclose(got, want, atol=1e-12)
