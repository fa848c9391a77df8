"""Filter application layer tests (reference test/filt.jl, filt_order
strategy: cross-implementation consistency + scipy oracles + a naive
numpy model of the reference's DF2T semantics)."""

import numpy as np
import pytest
from scipy import signal as sp

import dsptpu
from dsptpu.filters import (filt, sosfilt, DF2TFilter, filtfilt, fftfilt,
                            tdfilt, filt_stepstate, filt_stepstate_sos,
                            PolynomialRatio, Biquad, SecondOrderSections,
                            digitalfilter, Butterworth, Lowpass, as_sos,
                            coefb, coefa)

rng = np.random.default_rng(1776)


def naive_sosfilt(sos, g, x, si=None):
    """Sequential DF2T biquad cascade, the reference algorithm
    (filt.jl:35-51) in plain numpy."""
    sos = np.asarray(sos, dtype=np.float64).reshape(-1, 5)
    x = np.asarray(x, dtype=np.float64)
    si = np.zeros((2, sos.shape[0])) if si is None else np.array(si, float)
    out = np.empty_like(x)
    for i in range(len(x)):
        yi = x[i]
        for fi, (b0, b1, b2, a1, a2) in enumerate(sos):
            xi = yi
            yi = b0 * xi + si[0, fi]
            si[0, fi] = b1 * xi - a1 * yi + si[1, fi]
            si[1, fi] = b2 * xi - a2 * yi
        out[i] = g * yi
    return out, si


def butter_sos(order=8, wn=0.2):
    f = digitalfilter(Lowpass(wn), Butterworth(order))
    return as_sos(f)


class TestSOSFilt:
    def test_matches_naive_model(self):
        f = butter_sos(6, 0.3)
        x = rng.standard_normal(300)
        want, _ = naive_sosfilt(f.sos_array(), f.g, x)
        got = np.asarray(sosfilt(f, x))
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-10)

    def test_matches_scipy(self):
        sos_sp = sp.butter(8, 0.2, output="sos")
        # scipy sos rows are [b0 b1 b2 1 a1 a2]; ours [b0 b1 b2 a1 a2]
        ours = np.column_stack([sos_sp[:, :3], sos_sp[:, 4:]])
        x = rng.standard_normal(500)
        got = np.asarray(sosfilt(ours, x))
        want = sp.sosfilt(sos_sp, x)
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-10)

    def test_multichannel(self):
        f = butter_sos()
        x = rng.standard_normal((200, 3, 2))
        got = np.asarray(sosfilt(f, x))
        for i in range(3):
            for j in range(2):
                want, _ = naive_sosfilt(f.sos_array(), f.g, x[:, i, j])
                np.testing.assert_allclose(got[:, i, j], want, atol=1e-10)

    def test_streaming_state(self):
        f = butter_sos()
        x = rng.standard_normal(256)
        whole = np.asarray(sosfilt(f, x))
        si = np.zeros((2, len(f.biquads)))
        parts = []
        for chunk in np.split(x, [50, 129, 200]):
            y, si = sosfilt(f, chunk, si=si)
            parts.append(np.asarray(y))
        np.testing.assert_allclose(np.concatenate(parts), whole, atol=1e-10)

    def test_zpk_and_biquad_dispatch(self):
        f = digitalfilter(Lowpass(0.25), Butterworth(4))
        x = rng.standard_normal(128)
        via_zpk = np.asarray(filt(f, x))
        via_sos = np.asarray(filt(as_sos(f), x))
        np.testing.assert_allclose(via_zpk, via_sos, atol=1e-12)
        bq = Biquad(0.2, 0.3, 0.1, -0.4, 0.2)
        got = np.asarray(filt(bq, x))
        want, _ = naive_sosfilt([[0.2, 0.3, 0.1, -0.4, 0.2]], 1.0, x)
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_polynomialratio_dispatch(self):
        b, a = sp.butter(4, 0.2)
        x = rng.standard_normal(200)
        got = np.asarray(filt(PolynomialRatio(b, a), x))
        want = sp.lfilter(b, a, x)
        np.testing.assert_allclose(got, want, atol=1e-10)


class TestDF2TFilter:
    def test_chunked_equals_whole_tf(self):
        b, a = sp.butter(5, 0.3)
        x = rng.standard_normal(300)
        fobj = DF2TFilter(PolynomialRatio(b, a))
        parts = [np.asarray(fobj(c)) for c in np.split(x, [100, 180])]
        np.testing.assert_allclose(np.concatenate(parts),
                                   sp.lfilter(b, a, x), atol=1e-10)

    def test_chunked_equals_whole_sos(self):
        f = butter_sos()
        x = rng.standard_normal(300)
        fobj = DF2TFilter(f)
        parts = [np.asarray(fobj(c)) for c in np.split(x, 5)]
        np.testing.assert_allclose(np.concatenate(parts),
                                   np.asarray(sosfilt(f, x)), atol=1e-10)

    def test_coldims(self):
        b, a = sp.butter(3, 0.4)
        x = rng.standard_normal((100, 4))
        fobj = DF2TFilter(PolynomialRatio(b, a), coldims=(4,))
        y = np.asarray(fobj(x))
        np.testing.assert_allclose(y, sp.lfilter(b, a, x, axis=0), atol=1e-10)

    def test_fir_df2t(self):
        b = sp.firwin(21, 0.3)
        x = rng.standard_normal(128)
        fobj = DF2TFilter(PolynomialRatio(b, [1.0]))
        parts = [np.asarray(fobj(c)) for c in np.split(x, [37])]
        np.testing.assert_allclose(np.concatenate(parts),
                                   sp.lfilter(b, [1.0], x), atol=1e-12)

    def test_state_shape_validation(self):
        with pytest.raises(ValueError):
            DF2TFilter(PolynomialRatio([1.0, 0.5], [1.0]), si=np.zeros(5))


class TestStepState:
    def test_matches_scipy_lfilter_zi(self):
        b, a = sp.butter(5, 0.25)
        zi, _, _ = filt_stepstate(b, a)
        np.testing.assert_allclose(zi, sp.lfilter_zi(b, a), atol=1e-9)

    def test_sos_stepstate_steady(self):
        f = butter_sos(4, 0.3)
        sos = f.sos_array()
        si = filt_stepstate_sos(sos)
        # feeding a constant 1 must give a constant (steady-state) output
        y, _ = naive_sosfilt(sos, 1.0, np.ones(50), si=si.copy())
        np.testing.assert_allclose(y, y[0], rtol=1e-9)


class TestFiltFilt:
    def test_iir_matches_scipy(self):
        b, a = sp.butter(4, 0.2)
        x = rng.standard_normal(400)
        got = np.asarray(filtfilt(b, a, x))
        want = sp.filtfilt(b, a, x, padtype="odd",
                           padlen=3 * (max(len(a), len(b)) - 1))
        np.testing.assert_allclose(got, want, atol=1e-9)

    def test_iir_multichannel(self):
        b, a = sp.butter(3, 0.35)
        x = rng.standard_normal((256, 3))
        got = np.asarray(filtfilt(b, a, x))
        want = sp.filtfilt(b, a, x, axis=0, padtype="odd",
                           padlen=3 * (max(len(a), len(b)) - 1))
        np.testing.assert_allclose(got, want, atol=1e-9)

    def test_fir_path(self):
        b = sp.firwin(31, 0.3)
        x = rng.standard_normal(300)
        got = np.asarray(filtfilt(b, x))
        want = sp.filtfilt(b, [1.0], x, padtype="odd", padlen=len(b) - 1)
        np.testing.assert_allclose(got, want, atol=1e-9)

    def test_sos_naive_model(self):
        """SOS filtfilt against a sequential numpy model of the
        reference algorithm (filt.jl:341-360)."""
        f = butter_sos(6, 0.15)
        sos, g = f.sos_array(), f.g
        x = rng.standard_normal(200)
        pad = min(6 * sos.shape[0], len(x) - 1)
        zi = filt_stepstate_sos(sos)
        ext = np.concatenate([2 * x[0] - x[pad:0:-1], x,
                              2 * x[-1] - x[-2:-pad - 2:-1]])
        y1, _ = naive_sosfilt(sos, g, ext, si=zi * ext[0])
        y1 = y1[::-1]
        y2, _ = naive_sosfilt(sos, g, y1, si=zi * y1[0])
        want = y2[::-1][pad:pad + len(x)]
        got = np.asarray(filtfilt(f, x))
        np.testing.assert_allclose(got, want, atol=1e-9)

    def test_zero_phase(self):
        # a pure sinusoid in the passband comes out with no phase shift
        n = 1024
        t = np.arange(n)
        x = np.sin(2 * np.pi * 0.02 * t)
        f = digitalfilter(Lowpass(0.3), Butterworth(6))
        y = np.asarray(filtfilt(f, x))
        np.testing.assert_allclose(y[100:-100], x[100:-100], atol=1e-3)


class TestFFTFilt:
    def test_matches_direct(self):
        b = rng.standard_normal(129)
        x = rng.standard_normal(4000)
        got = np.asarray(fftfilt(b, x))
        want = sp.lfilter(b, [1.0], x)
        np.testing.assert_allclose(got, want, atol=1e-9)

    def test_multichannel_and_nfft(self):
        b = rng.standard_normal(65)
        x = rng.standard_normal((1000, 3))
        want = sp.lfilter(b, [1.0], x, axis=0)
        np.testing.assert_allclose(np.asarray(fftfilt(b, x)), want, atol=1e-9)
        np.testing.assert_allclose(np.asarray(fftfilt(b, x, nfft=256)), want,
                                   atol=1e-9)

    def test_tdfilt(self):
        b = rng.standard_normal(15)
        x = rng.standard_normal(200)
        np.testing.assert_allclose(np.asarray(tdfilt(b, x)),
                                   sp.lfilter(b, [1.0], x), atol=1e-11)

    def test_long_fir_auto_os(self):
        # filt(b, x) auto-selects overlap-save above the tap cutoff
        b = rng.standard_normal(500)
        x = rng.standard_normal(8000)
        got = np.asarray(dsptpu.filt(b, x))
        np.testing.assert_allclose(got, sp.lfilter(b, [1.0], x), atol=1e-8)


class TestBlockedBiquad:
    """Exercise the blocked parallel linear-recurrence path
    (n >= 4 * _BIQUAD_BLOCK), including non-divisible lengths."""

    @pytest.mark.parametrize("n", [4096, 5000, 4097])
    def test_long_sosfilt_matches_scipy(self, n):
        sos_sp = sp.butter(8, 0.2, output="sos")
        ours = np.column_stack([sos_sp[:, :3], sos_sp[:, 4:]])
        x = rng.standard_normal(n)
        got = np.asarray(sosfilt(ours, x))
        np.testing.assert_allclose(got, sp.sosfilt(sos_sp, x), atol=1e-9)

    def test_long_streaming_state(self):
        f = butter_sos()
        x = rng.standard_normal(3000)
        whole = np.asarray(sosfilt(f, x))
        si = np.zeros((2, len(f.biquads)))
        parts = []
        for chunk in np.split(x, [1025, 2060]):
            y, si = sosfilt(f, chunk, si=si)
            parts.append(np.asarray(y))
        np.testing.assert_allclose(np.concatenate(parts), whole, atol=1e-9)

    def test_long_filtfilt(self):
        b, a = sp.butter(4, 0.2)
        x = rng.standard_normal(6000)
        got = np.asarray(filtfilt(b, a, x))
        want = sp.filtfilt(b, a, x, padtype="odd",
                           padlen=3 * (max(len(a), len(b)) - 1))
        np.testing.assert_allclose(got, want, atol=1e-8)

    def test_long_multichannel(self):
        sos_sp = sp.butter(6, 0.3, output="sos")
        ours = np.column_stack([sos_sp[:, :3], sos_sp[:, 4:]])
        x = rng.standard_normal((2048, 3))
        got = np.asarray(sosfilt(ours, x))
        np.testing.assert_allclose(got, sp.sosfilt(sos_sp, x, axis=0),
                                   atol=1e-9)
