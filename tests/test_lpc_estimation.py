"""LPC and estimation tests (reference test/lpc.jl, test/estimation.jl:
AR-process recovery + synthesized-cisoid tolerance checks)."""

import numpy as np
import pytest
from scipy import signal as sp

from dsptpu.ops.lpc import lpc, arburg, levinson
from dsptpu.ops.estimation import esprit, jacobsen, quinn

rng = np.random.default_rng(1776)


def make_ar(coeffs, n=8192, seed=0):
    """x driven by white noise through 1/(1 + sum a_k z^-k)."""
    e = np.random.default_rng(seed).standard_normal(n)
    return sp.lfilter([1.0], np.concatenate([[1.0], coeffs]), e)


class TestLPC:
    true_a = np.array([-0.5, 0.2])

    def test_burg_recovers_ar2(self):
        x = make_ar(self.true_a)
        a, err = lpc(x, 2)
        np.testing.assert_allclose(np.asarray(a), self.true_a, atol=0.02)
        assert 0.9 < float(err) < 1.1

    def test_levinson_recovers_ar2(self):
        x = make_ar(self.true_a)
        a, err = lpc(x, 2, method="levinson")
        np.testing.assert_allclose(np.asarray(a), self.true_a, atol=0.02)

    def test_burg_matches_levinson_high_order(self):
        x = make_ar([-0.3, 0.4, -0.1, 0.05], n=16384)
        ab, _ = lpc(x, 16)
        al, _ = lpc(x, 16, method="levinson")
        np.testing.assert_allclose(np.asarray(ab), np.asarray(al), atol=0.02)

    def test_arburg_full_output(self):
        x = make_ar(self.true_a)
        a, err, k = arburg(x, 2)
        assert np.asarray(a)[0] == 1.0
        assert np.asarray(k).shape == (2,)
        np.testing.assert_allclose(np.asarray(a)[1:], self.true_a, atol=0.02)

    def test_batched_channels(self):
        x1 = make_ar(self.true_a, seed=1)
        x2 = make_ar([-0.7, 0.3], seed=2)
        X = np.stack([x1, x2], axis=1)
        a, err, k = arburg(X, 2)
        a1, _, _ = arburg(x1, 2)
        a2, _, _ = arburg(x2, 2)
        np.testing.assert_allclose(np.asarray(a)[:, 0], np.asarray(a1),
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(a)[:, 1], np.asarray(a2),
                                   atol=1e-10)

    def test_levinson_toeplitz_solution(self):
        # a solves T(-a) = R[1:p+1] with T hermitian toeplitz of R[0:p]
        x = make_ar([-0.4, 0.25, 0.1])
        n = len(x)
        R = np.correlate(x, x, "full")[n - 1:] / n
        p = 3
        a, err, _ = levinson(R, p)
        from scipy.linalg import toeplitz
        Tm = toeplitz(R[:p])
        want = np.linalg.solve(Tm, -R[1: p + 1])
        np.testing.assert_allclose(np.asarray(a), want, atol=1e-8)

    def test_order_too_large(self):
        with pytest.raises(ValueError):
            arburg(np.ones(5), 5)


class TestEstimation:
    def test_esprit_two_cisoids(self):
        # reference estimation.jl docstring example
        Fs = 8000
        t = np.arange(1, Fs + 1) / Fs
        x = (2 * np.exp(1j * 2 * np.pi * 2500 * t)
             + 5 * np.exp(1j * 2 * np.pi * 400 * t))
        x = x + np.random.default_rng(0).standard_normal(Fs) * (1 + 1j)
        f = np.sort(esprit(x, 5, 2, Fs))
        np.testing.assert_allclose(f, [400, 2500], atol=5)

    def test_jacobsen_complex(self):
        fs = 100.0
        t = np.arange(0, 5, 1 / fs)
        for f in (-40.3, 25.1, 0.7):
            x = np.exp(1j * (2 * np.pi * f * t + 0.3))
            assert abs(jacobsen(x, fs) - f) < 0.05

    def test_jacobsen_real(self):
        fs = 100.0
        t = np.arange(0, 5, 1 / fs)
        x = np.cos(2 * np.pi * 28.4 * t + 0.1)
        assert abs(jacobsen(x, fs) - 28.4) < 0.05

    def test_quinn_real(self):
        fs = 100.0
        t = np.arange(0, 3, 1 / fs)
        x = np.cos(2 * np.pi * 17.3 * t + 0.4) \
            + 0.1 * np.random.default_rng(1).standard_normal(len(t))
        est, maxed = quinn(x, Fs=fs)
        assert not maxed
        assert abs(est - 17.3) < 0.05

    def test_quinn_complex(self):
        fs = 100.0
        t = np.arange(0, 3, 1 / fs)
        x = np.exp(1j * (2 * np.pi * (-13.7) * t + 0.2)) \
            + 0.05 * np.random.default_rng(2).standard_normal(len(t))
        est, maxed = quinn(x, Fs=fs)
        assert not maxed
        assert abs(est - (-13.7)) < 0.05
