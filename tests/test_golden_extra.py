"""Remaining MATLAB golden-fixture tests (reference test/filt.jl,
test/periodograms.jl mt_pgram/pmtm, test/filter_response.jl)."""

import numpy as np
import pytest

import dsptpu
from dsptpu.filters import (PolynomialRatio, DF2TFilter, filtfilt,
                            digitalfilter, Lowpass, Butterworth,
                            freqresp, phaseresp, grpdelay, impresp, stepresp,
                            as_sos, as_zpk)
from dsptpu.ops.multitaper import mt_pgram
from dsptpu.ops import windows
from helpers import read_reference_data

# the MATLAB example filter used across the response fixtures
# (reference test/filter_response.jl:87-110)
_B = 0.05634 * np.convolve([1, 1], [1, -1.0166, 1])
_A = np.convolve([1, -0.683], [1, -1.4461, 0.7957])


class TestFiltGolden:
    def test_filt_with_initial_conditions(self):
        # reference test/filt.jl "filt! with init. cond."
        want = read_reference_data("filt_check.txt")
        x = read_reference_data("spectrogram_x.txt")
        b, a, z = [0.4, 1.0], [0.9, 0.6], np.array([0.4750])
        y, _ = dsptpu.filt(b, a, x, si=z)
        np.testing.assert_allclose(np.asarray(y), want, rtol=1e-9)
        fobj = DF2TFilter(PolynomialRatio(b, a), si=z * (1 / 0.9) * 0.9)
        np.testing.assert_allclose(np.asarray(fobj(x)), want, rtol=1e-9)

    def test_df2t_steady_state_dc(self):
        zpg = digitalfilter(Lowpass(0.25), Butterworth(5))
        si = [0.9967207836936347, -1.4940914728163142, 1.2841226760316475,
              -0.4524417279474106, 0.07559488540931815]
        y = np.asarray(DF2TFilter(PolynomialRatio(
            np.asarray(dsptpu.filters.coefb(
                dsptpu.filters.as_polynomial_ratio(zpg))),
            np.asarray(dsptpu.filters.coefa(
                dsptpu.filters.as_polynomial_ratio(zpg)))), si=np.asarray(si))
            (np.ones(10)))
        np.testing.assert_allclose(y, np.ones(10), rtol=1e-7)

    def test_filtfilt_1d_matlab(self):
        want = read_reference_data("filtfilt_output.txt")
        b = [0.00327922, 0.01639608, 0.03279216, 0.03279216, 0.01639608,
             0.00327922]
        a = [1., -2.47441617, 2.81100631, -1.70377224, 0.54443269,
             -0.07231567]
        x = read_reference_data("spectrogram_x.txt")
        np.testing.assert_allclose(np.asarray(filtfilt(b, a, x)), want,
                                   rtol=1e-7, atol=1e-9)

    def test_filtfilt_2d_matlab(self):
        want = read_reference_data("filtfilt_output_2d.txt")
        b = [0.00327922, 0.01639608, 0.03279216, 0.03279216, 0.01639608,
             0.00327922]
        a = [1., -2.47441617, 2.81100631, -1.70377224, 0.54443269,
             -0.07231567]
        x = read_reference_data("spectrogram_x.txt")
        X = np.tile(x[:, None], (1, 3))
        X[:, 1] = np.roll(X[:, 1], 64)
        X[:, 2] = np.roll(X[:, 2], 128)
        np.testing.assert_allclose(np.asarray(filtfilt(b, a, X)), want,
                                   rtol=1e-7, atol=1e-9)


class TestMTPgramGolden:
    def test_mt_pgram_matlab(self):
        # MATLAB: pmtm(stft_x, 4, 5000, 16000, 'unity')
        s = read_reference_data("stft_x.txt")
        want = read_reference_data("mt_pgram.txt")
        p = mt_pgram(s, fs=16000, nfft=5000)
        np.testing.assert_allclose(np.asarray(p.power), want, rtol=1e-6)
        p2 = mt_pgram(s, fs=16000, nfft=5000,
                      window=np.asarray(windows.dpss(len(s), 4)))
        np.testing.assert_allclose(np.asarray(p2.power), want, rtol=1e-6)

    def test_pmtm_real(self):
        # MATLAB: [pxx,fx] = pmtm(x, 4, 2^nextpow2(len), 1000, 'unity')
        x = read_reference_data("pmtm_x.txt")
        fx = read_reference_data("pmtm_fx.txt")
        pxx = read_reference_data("pmtm_pxx.txt")
        nfft = 1 << (len(x) - 1).bit_length()
        p = mt_pgram(x, fs=1000, nw=4, nfft=nfft)
        np.testing.assert_allclose(p.freq, fx, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(p.power), pxx, rtol=1e-6)

    def test_pmtm_complex(self):
        x = read_reference_data("pmtm_x.txt")
        y = read_reference_data("pmtm_y.txt")
        z = x + 1j * y
        fz = read_reference_data("pmtm_fz.txt")
        pzz = read_reference_data("pmtm_pzz.txt")
        nfft = 1 << (len(x) - 1).bit_length()
        p = mt_pgram(z, fs=1000, nw=4, nfft=nfft)
        mask = (p.freq > 0) & (p.freq < 500)
        nf = int(np.count_nonzero(mask))
        np.testing.assert_allclose(p.freq[mask], fz[1: nf + 1], rtol=1e-12)
        np.testing.assert_allclose(np.asarray(p.power)[mask],
                                   pzz[1: nf + 1], rtol=1e-6)


class TestResponseGolden:
    def test_freqz_matlab(self):
        ref = read_reference_data("freqz-eg1.txt")
        w = np.linspace(0, 6.280045284537, 2001)
        h = freqresp(PolynomialRatio(_B, _A), w)
        np.testing.assert_allclose(np.abs(h), ref[:, 1], rtol=1e-8,
                                   atol=1e-10)

    def test_responses_matlab(self):
        ref = read_reference_data("responses-eg1.txt")
        df = PolynomialRatio(_B, _A)
        w = ref[:, 0]
        np.testing.assert_allclose(np.asarray(impresp(df, 512)), ref[:, 1],
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(stepresp(df, 512)), ref[:, 2],
                                   atol=1e-8)
        np.testing.assert_allclose(np.abs(freqresp(df, w)), ref[:, 3],
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.abs(freqresp(as_sos(df), w)),
                                   ref[:, 3], rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.abs(freqresp(as_zpk(df), w)),
                                   ref[:, 3], rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(phaseresp(df, w), ref[:, 4], atol=1e-7)

    def test_freqs_matlab(self):
        ref = read_reference_data("freqs-eg1.txt")
        b, a = [0.2, 0.3, 1.0], [1.0, 0.4, 1.0]
        w = 10.0 ** np.linspace(-1, 1, 50)
        df = PolynomialRatio(b, a, domain="s")
        h = freqresp(df, w)
        np.testing.assert_allclose(w, ref[:, 0], rtol=1e-8)
        np.testing.assert_allclose(np.abs(h), ref[:, 1], rtol=1e-8)
        np.testing.assert_allclose((180 / np.pi) * phaseresp(df, w),
                                   ref[:, 2], atol=1e-6)
        np.testing.assert_allclose(freqresp(as_zpk(df), w), h, rtol=1e-8)
        np.testing.assert_allclose(freqresp(as_sos(df), w), h, rtol=1e-8)

    def test_grpdelay_matlab(self):
        ref = read_reference_data("grpdelay_eg1.txt")
        df = PolynomialRatio(_B, _A)
        got = grpdelay(df, ref[:, 0])
        np.testing.assert_allclose(got, ref[:, 1], rtol=1e-7, atol=1e-9)
