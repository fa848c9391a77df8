"""Order estimation tests (reference test/filt_order.jl strategy:
scipy oracle — the reference file itself derives from scipy)."""

import numpy as np
import pytest
from scipy import signal as sp

from dsptpu.filters.filt_order import (buttord, cheb1ord, cheb2ord, ellipord,
                                       remezord, ellipk_agm)


class TestButtord:
    """MATLAB-checked fixtures from reference test/filt_order.jl:5-60
    (the reference matches MATLAB's stopband-exact natural frequency,
    which differs from scipy's)."""

    def test_lowpass_matlab(self):
        N, wn = buttord(40 / 500, 150 / 500, 3, 60)
        assert N == 5
        np.testing.assert_allclose(wn, 0.081038494957764, rtol=1e-9)

    def test_lowpass_analog(self):
        N, wn = buttord(40 / 500, 150 / 500, 3, 60, domain="s")
        assert N == 6
        np.testing.assert_allclose(wn, 0.0948683377107, rtol=1e-9)

    def test_highpass_matlab(self):
        N, wn = buttord(1200 / 2000, 600 / 2000, 3, 60)
        assert N == 7
        np.testing.assert_allclose(wn, 0.597905417809, rtol=1e-9)

    def test_highpass_analog(self):
        N, wn = buttord(1200 / 2000, 600 / 2000, 3, 60, domain="s")
        assert N == 10
        np.testing.assert_allclose(wn, 0.598578664562, rtol=1e-9)

    def test_bandpass_matlab(self):
        N, wn = buttord((100 / 500, 200 / 500), (50 / 500, 250 / 500), 3, 40)
        assert N == 8
        np.testing.assert_allclose(wn, (0.195101359239, 0.408043633382),
                                   rtol=1e-9)

    def test_bandstop_order_matches_scipy(self):
        N, wn = buttord((0.1, 0.6), (0.2, 0.5), 3, 40)
        Ns, wns = sp.buttord([0.1, 0.6], [0.2, 0.5], 3, 40)
        assert N == Ns
        np.testing.assert_allclose(wn, np.sort(wns), rtol=2e-2)

    def test_unordered_bands_raise(self):
        with pytest.raises(ValueError):
            buttord((0.1, 0.4), (0.2, 0.6), 1, 40)


class TestChebOrd:
    def test_cheb1_lp(self):
        N, wn = cheb1ord(0.2, 0.3, 1, 40)
        Ns, wns = sp.cheb1ord(0.2, 0.3, 1, 40)
        assert N == Ns
        np.testing.assert_allclose(wn, wns, rtol=1e-8)

    def test_cheb1_hp(self):
        N, wn = cheb1ord(0.3, 0.2, 1, 40)
        Ns, wns = sp.cheb1ord(0.3, 0.2, 1, 40)
        assert N == Ns

    def test_cheb1_bandpass(self):
        N, _ = cheb1ord((0.2, 0.5), (0.1, 0.6), 3, 40)
        Ns, _ = sp.cheb1ord([0.2, 0.5], [0.1, 0.6], 3, 40)
        assert N == Ns

    def test_cheb2_lp(self):
        N, wn = cheb2ord(0.2, 0.3, 1, 40)
        Ns, wns = sp.cheb2ord(0.2, 0.3, 1, 40)
        assert N == Ns
        np.testing.assert_allclose(wn, wns, rtol=1e-8)

    def test_cheb2_bandpass(self):
        N, wn = cheb2ord((0.2, 0.5), (0.1, 0.6), 3, 40)
        Ns, wns = sp.cheb2ord([0.2, 0.5], [0.1, 0.6], 3, 40)
        assert N == Ns
        np.testing.assert_allclose(np.sort(wn), np.sort(wns), rtol=1e-6)

    def test_cheb2_analog(self):
        N, wn = cheb2ord(100.0, 150.0, 0.5, 60, domain="s")
        Ns, wns = sp.cheb2ord(100.0, 150.0, 0.5, 60, analog=True)
        assert N == Ns
        np.testing.assert_allclose(wn, wns, rtol=1e-8)


class TestEllipOrd:
    def test_lp(self):
        N, wn = ellipord(0.2, 0.3, 1, 60)
        Ns, wns = sp.ellipord(0.2, 0.3, 1, 60)
        assert N == Ns
        np.testing.assert_allclose(wn, wns, rtol=1e-8)

    def test_hp(self):
        N, _ = ellipord(0.35, 0.2, 0.5, 50)
        Ns, _ = sp.ellipord(0.35, 0.2, 0.5, 50)
        assert N == Ns

    def test_bandpass(self):
        N, _ = ellipord((0.2, 0.5), (0.1, 0.6), 3, 40)
        Ns, _ = sp.ellipord([0.2, 0.5], [0.1, 0.6], 3, 40)
        assert N == Ns

    def test_ellipk(self):
        from scipy.special import ellipk as sp_ellipk
        for m in (0.0, 0.1, 0.5, 0.9, 0.999):
            np.testing.assert_allclose(ellipk_agm(m), sp_ellipk(m),
                                       rtol=1e-12)


class TestRemezord:
    def test_lowpass_estimate(self):
        # Herrmann/Rabiner formula; sanity: close to the classic
        # kaiserord-style estimate and monotone in transition width
        n1 = remezord(0.2, 0.25, 0.01, 0.001)
        n2 = remezord(0.2, 0.30, 0.01, 0.001)
        assert n1 > n2 > 0
        with pytest.raises(ValueError):
            remezord(0.6, 0.7, 0.01, 0.001)
