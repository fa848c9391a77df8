"""Parks-McClellan tests (reference test/remez_fir.jl: scipy golden
fixtures, both call forms, argument checks, convergence behavior)."""

import numpy as np
import pytest

from dsptpu.filters.remez_fir import remez
from dsptpu.filters import PolynomialRatio, freqresp
from helpers import read_reference_data


class TestGoldenFixtures:
    @pytest.mark.parametrize("name,args,kw", [
        ("remez_151_lpf.txt", (151, [0, 0.475, 0.5, 1.0], [1.0, 0.0]),
         dict(Hz=2.0)),
        ("remez_152_lpf.txt", (152, [0, 0.475, 0.5, 1.0], [1.0, 0.0]),
         dict(weight=[1, 2], Hz=2.0)),
        ("remez_51_hpf.txt", (51, [0, 0.75, 0.8, 1.0], [0.0, 1.0]),
         dict(Hz=2.0)),
        ("remez_180_bpf.txt",
         (180, [0, 0.375, 0.4, 0.5, 0.525, 1.0], [0.0, 1.0, 0.0]),
         dict(Hz=2.0, maxiter=30)),
        ("remez_20_hilbert.txt", (20, [0.1, 0.95], [1]),
         dict(filter_type="hilbert", Hz=2.0)),
        ("remez_21_hilbert.txt", (21, [0.1, 0.95], [1]),
         dict(filter_type="hilbert", Hz=2.0)),
        ("remez_200_differentiator.txt", (200, [0.01, 0.99], [1]),
         dict(filter_type="differentiator", Hz=2.0)),
        ("remez_201_differentiator.txt", (201, [0.05, 0.95], [1]),
         dict(filter_type="differentiator", Hz=2.0)),
    ])
    def test_scipy_fixture(self, name, args, kw):
        want = read_reference_data(name)
        h = remez(*args, **kw)
        np.testing.assert_allclose(h, want, atol=1e-10)

    def test_band_defs_form(self):
        want = read_reference_data("remez_151_lpf.txt")
        h = remez(151, [((0, 0.475), 1), ((0.5, 1.0), 0)], Hz=2.0)
        np.testing.assert_allclose(h, want, atol=1e-10)
        want = read_reference_data("remez_152_lpf.txt")
        h = remez(152, [((0, 0.475), (1, 1)), ((0.5, 1.0), (0, 2))], Hz=2.0)
        np.testing.assert_allclose(h, want, atol=1e-10)
        want = read_reference_data("remez_21_hilbert.txt")
        h = remez(21, [((0.1, 0.95), 1)], neg=True, Hz=2.0)
        np.testing.assert_allclose(h, want, atol=1e-10)
        want = read_reference_data("remez_201_differentiator.txt")
        h = remez(201, [((0.05, 0.95), (lambda f: f / 2, lambda f: 1 / f))],
                  neg=True, Hz=2.0)
        np.testing.assert_allclose(h, want, atol=1e-9)


class TestArgumentChecks:
    def test_nonmonotonic_bands(self):
        with pytest.raises(ValueError):
            remez(151, [0, 0.25, 0.25, 0.5], [1.0, 0.0])
        with pytest.raises(ValueError):
            remez(151, [0.2, 0.1, 0.25, 0.5], [1.0, 0.0])

    def test_bands_out_of_range(self):
        with pytest.raises(ValueError):
            remez(151, [0, 0.23, 0.25, 0.6], [1.0, 0.0])
        with pytest.raises(ValueError):
            remez(151, [-0.01, 0.23, 0.25, 0.5], [1.0, 0.0])

    def test_band_count_mismatch(self):
        with pytest.raises(ValueError):
            remez(151, [0, 0.23, 0.5], [1.0, 0.0])

    def test_weight_count_mismatch(self):
        with pytest.raises(ValueError):
            remez(151, [0, 0.23, 0.25, 0.5], [1.0, 0.0],
                  weight=[1.0, 1.0, 17.0])


class TestConvergence:
    def test_warn_at_maxiter(self):
        with pytest.warns(UserWarning, match="not converged"):
            remez(180, [0, 0.375, 0.4, 0.5, 0.525, 1.0], [0.0, 1.0, 0.0],
                  Hz=2.0, maxiter=3)

    def test_custom_response_function(self):
        # inverse-sinc compensation (reference test/remez_fir.jl
        # "inverse_sinc_response_function")
        L = 64
        Fs = 4800 * L

        def invsinc(f):
            return 1.0 if f == 0 else abs(
                (np.pi * f / 4800) / np.sin(np.pi * f / 4800))

        g = remez(201, [((0.0, 2880.0), (invsinc, 1.0)),
                        ((10000.0, Fs / 2), (0.0, 100.0))], Hz=Fs)
        f = np.linspace(1e-9, 2880 / Fs, 200)
        H = freqresp(PolynomialRatio(g, [1.0]), 2 * np.pi * f)
        want = np.array([invsinc(v * Fs) for v in f])
        # reference asserts < 0.25 dB max passband error
        err_db = np.abs(20 * np.log10(np.abs(H)) - 20 * np.log10(want))
        assert np.max(err_db) < 0.25


class TestEquioscillation:
    def test_lowpass_ripple_structure(self):
        h = remez(65, [0, 0.2, 0.25, 0.5], [1.0, 0.0])
        w = np.linspace(0, np.pi * 0.4, 2000)
        H = np.abs(freqresp(PolynomialRatio(h, [1.0]), w))
        ripple = np.max(np.abs(H - 1.0))
        w2 = np.linspace(np.pi * 0.5, np.pi, 2000)
        H2 = np.abs(freqresp(PolynomialRatio(h, [1.0]), w2))
        np.testing.assert_allclose(np.max(H2), ripple, rtol=0.05)
