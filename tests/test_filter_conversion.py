"""Coefficient-conversion parity tests, ported from the reference
test/filter_conversion.jl (golden MATLAB zp2sos matrices transcribed
from there — sanctioned numeric ground truth)."""

import numpy as np
import pytest

import dsptpu
from dsptpu.filters import (ZeroPoleGain, PolynomialRatio, Biquad,
                            SecondOrderSections, as_zpk, as_sos,
                            as_biquad, as_polynomial_ratio, coefb, coefa,
                            digitalfilter, Lowpass, Highpass, Bandpass,
                            Bandstop, Butterworth, Chebyshev1, Chebyshev2,
                            Elliptic, filt)

rng = np.random.default_rng(1776)

_ZRE = [0.07674942314081117, -0.10637764563083413, 0.19723688182100613,
        0.07019769777809694, -0.029225401438832663, -0.35980697033738923,
        0.3712083544916094, -0.17585090520154495, -0.2308322620393009,
        -0.008498685920569043]
_ZIM = [0.5605934468331276, 0.00938830970435945, 0.20500254264692958,
        0.00040337356287483566, 0.35500551559734517, 0.21595798755003964,
        0.41767928564585416, 0.32300027988596314, 0.3539248310694154,
        0.028356975487226484]
_PRE = [-0.946179900464128, 0.05191136844411161, -0.05109307872385063,
        -0.032892467440199066, -0.1266287653888985, -0.15051989876024102,
        -0.6672740143157547, -0.790336466064852, -0.009317017740249631,
        0.5075897927503011]
_PIM = [0.23187351222922784, 0.8713748123758278, 0.7440280322767342,
        0.024218620496805687, 0.33150956246323654, 0.9373469058653078,
        0.5034138963468052, 0.109069102200402, 0.013158400271660778,
        0.02902816288546107]
_K = 10586.686805294861


def _conj_pairs(re, im):
    c = np.asarray(re) + 1j * np.asarray(im)
    return np.concatenate([c, np.conj(c)])


def _sos_matrix(f):
    """(nsec, 6) MATLAB-convention [b0 b1 b2 1 a1 a2] matrix."""
    s = f.sos_array()
    return np.column_stack([s[:, :3], np.ones(s.shape[0]), s[:, 3:]])


M_SOS_FULL = np.array([
    [1, -1.4039539555619387e-01, 4.9278794835762620e-03, 1, 1.8634035480499262e-02, 2.5995031728136877e-04],
    [1, 1.6997371841138087e-02, 8.7634572115964215e-04, 1, 6.5784934880398133e-02, 1.6684559930728524e-03],
    [1, 2.1275529126166826e-01, 1.1404343849064294e-02, 1, 2.5325753077779700e-01, 1.2593343422848324e-01],
    [1, -3.9447376364201225e-01, 8.0928430042179728e-02, 1, -1.0151795855006023e+00, 2.5849003194479853e-01],
    [1, -7.4241670898321876e-01, 3.1225162810199936e-01, 1, 1.0218615744770126e-01, 5.5618821550707065e-01],
    [1, 3.5170181040308990e-01, 1.3525272166661328e-01, 1, 1.5806729321297039e+00, 6.3652779864668074e-01],
    [1, 4.6166452407860181e-01, 1.7854631924569470e-01, 1, 1.3345480286315095e+00, 6.9868016121613397e-01],
    [1, 5.8450802877665325e-02, 1.2688304019379779e-01, 1, -1.0382273688822322e-01, 7.6198885381674941e-01],
    [1, -1.5349884628162233e-01, 3.2015548658469395e-01, 1, 3.0103979752048204e-01, 9.0127546185805940e-01],
    [1, 7.1961394067477846e-01, 1.7609890829003397e-01, 1, 1.8923598009282561e+00, 9.4902172971582510e-01],
])

M_SOS_HALF = np.array([
    [0, 0, 1, 1, 1.8634035480499262e-02, 2.5995031728136877e-04],
    [0, 0, 1, 1, 6.5784934880398133e-02, 1.6684559930728524e-03],
    [0, 0, 1, 1, 2.5325753077779700e-01, 1.2593343422848324e-01],
    [0, 0, 1, 1, -1.0151795855006023e+00, 2.5849003194479853e-01],
    [0, 0, 1, 1, 1.0218615744770126e-01, 5.5618821550707065e-01],
    [1, -3.9447376364201225e-01, 8.0928430042179728e-02, 1, 1.5806729321297039e+00, 6.3652779864668074e-01],
    [1, -1.4039539555619387e-01, 4.9278794835762620e-03, 1, 1.3345480286315095e+00, 6.9868016121613397e-01],
    [1, 5.8450802877665325e-02, 1.2688304019379779e-01, 1, -1.0382273688822322e-01, 7.6198885381674941e-01],
    [1, -1.5349884628162233e-01, 3.2015548658469395e-01, 1, 3.0103979752048204e-01, 9.0127546185805940e-01],
    [1, 2.1275529126166826e-01, 1.1404343849064294e-02, 1, 1.8923598009282561e+00, 9.4902172971582510e-01],
])

M_SOS_EXTRA_FIRST_ROW = np.array(
    [0, 1, 0, 1, -0.7, 0])


class TestZP2SOSGolden:
    def test_full(self):
        z = _conj_pairs(_ZRE, _ZIM)
        p = _conj_pairs(_PRE, _PIM)
        f = as_sos(ZeroPoleGain(z, p, _K))
        np.testing.assert_allclose(_sos_matrix(f), M_SOS_FULL,
                                   rtol=1e-10, atol=1e-12)

    def test_half_zeros(self):
        z = _conj_pairs(_ZRE, _ZIM)
        zp = np.concatenate([z[:5], z[10:15]])
        p = _conj_pairs(_PRE, _PIM)
        f = as_sos(ZeroPoleGain(zp, p, _K))
        np.testing.assert_allclose(_sos_matrix(f), M_SOS_HALF,
                                   rtol=1e-10, atol=1e-12)

    def test_extra_real_pole(self):
        z = _conj_pairs(_ZRE, _ZIM)
        p = np.concatenate([_conj_pairs(_PRE, _PIM), [0.7]])
        f = as_sos(ZeroPoleGain(z, p, _K))
        m = _sos_matrix(f)
        np.testing.assert_allclose(m[0], M_SOS_EXTRA_FIRST_ROW,
                                   rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(m[1:], M_SOS_FULL,
                                   rtol=1e-10, atol=1e-12)

    def test_only_poles(self):
        p = _conj_pairs(_PRE, _PIM)
        f = as_sos(ZeroPoleGain([], p, _K))
        want = M_SOS_FULL.copy()
        want[:, :2] = 0.0
        want[:, 2] = 1.0
        np.testing.assert_allclose(_sos_matrix(f), want,
                                   rtol=1e-10, atol=1e-12)

    def test_butterworth_bandstop_repeated_zeros(self):
        want = np.array([
            [1, -1.9021224191804869, 1, 1, -1.8964983429993663, 9.9553672990017417e-01],
            [1, -1.9021224191804869, 1, 1, -1.8992956433548462, 9.9559721515078736e-01],
        ])
        f = as_sos(digitalfilter(Bandstop(49.5, 50.5), Butterworth(2),
                                 fs=1000))
        np.testing.assert_allclose(_sos_matrix(f), want, rtol=1e-7)
        assert np.isclose(f.g, 0.995566972017647)

    def test_clustered_roots_tf(self):
        f = ZeroPoleGain(np.ones(100), 0.99 * np.ones(100), 1.0)
        g = as_sos(f)
        bf, af = coefb(f), coefa(f)
        bg, ag = coefb(g), coefa(g)
        np.testing.assert_allclose(bg, bf, rtol=1e-6,
                                   atol=1e-6 * np.abs(bf).max())
        np.testing.assert_allclose(ag, af, rtol=1e-6,
                                   atol=1e-6 * np.abs(af).max())

    @pytest.mark.parametrize("zpk", [
        ZeroPoleGain([1 + 1j, 1 - 1j, 0.5 + 1j, 0.5 - 1j],
                     [1.0, 0.0, 0.0, 0.0], 1.0),
        digitalfilter(Bandpass(2 * 0.75 / 180, 2 * 10.0 / 180),
                      Elliptic(11, 0.25, 40)),       # issue #432 shape
    ])
    def test_zpk_sos_zpk_roundtrip(self, zpk):
        back = as_zpk(as_sos(zpk))
        key = lambda v: (np.real(v), np.imag(v))
        for a, b in ((zpk.p, back.p), (zpk.z, back.z)):
            a = sorted(a, key=key)
            b = sorted(b, key=key)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-7, atol=1e-9)
        assert np.isclose(zpk.k, back.k, rtol=1e-7)


def _zpk_eq(f1, f2, tol):
    z1 = np.sort_complex(as_zpk(f1).z)
    z2 = np.sort_complex(as_zpk(f2).z)
    p1 = np.sort_complex(as_zpk(f1).p)
    p2 = np.sort_complex(as_zpk(f2).p)
    np.testing.assert_allclose(z1, z2, rtol=tol, atol=tol)
    np.testing.assert_allclose(p1, p2, rtol=tol, atol=tol)
    assert np.isclose(as_zpk(f1).k, as_zpk(f2).k, rtol=tol)


class TestConversionLattice:
    CONVS = (as_zpk, as_polynomial_ratio, as_biquad, as_sos)

    @pytest.mark.parametrize("f", [
        digitalfilter(Lowpass(0.5), Butterworth(1)),
        digitalfilter(Lowpass(0.5), Butterworth(2)),
        digitalfilter(Bandpass(0.25, 0.75), Butterworth(1)),
    ])
    def test_every_pair_order_le_2(self, f):
        for c1 in self.CONVS:
            f2 = c1(f)
            for c2 in self.CONVS:
                _zpk_eq(f, c2(f2), 2e-7)

    @pytest.mark.parametrize("proto", [Butterworth(3), Chebyshev1(3, 1),
                                       Chebyshev2(3, 1)])
    def test_every_pair_order_3(self, proto):
        f = digitalfilter(Lowpass(0.5), proto)
        for c1 in (as_zpk, as_polynomial_ratio, as_sos):
            f2 = c1(f)
            for c2 in (as_zpk, as_polynomial_ratio, as_sos):
                _zpk_eq(f, c2(f2), 2e-5)


class TestGainAndComposition:
    def test_gain_scaling(self):
        x = rng.standard_normal(100)
        f1 = digitalfilter(Lowpass(0.3), Butterworth(2))
        y = np.asarray(filt(f1, x=x))
        for conv in (as_zpk, as_polynomial_ratio, as_biquad, as_sos):
            np.testing.assert_allclose(
                np.asarray(filt(3 * conv(f1), x=x)), 3 * y, rtol=1e-6)
            np.testing.assert_allclose(
                np.asarray(filt(conv(f1) * 3, x=x)), 3 * y, rtol=1e-6)

    def test_composition(self):
        x = rng.standard_normal(100)
        f1 = digitalfilter(Lowpass(0.3), Butterworth(2))
        f2 = digitalfilter(Highpass(0.5), Butterworth(1))
        f3 = digitalfilter(Bandstop(0.35, 0.4), Butterworth(1))
        y = np.asarray(filt(f3, x=filt(f2, x=filt(f1, x=x))))
        for conv in (as_zpk, as_polynomial_ratio, as_biquad, as_sos):
            got = np.asarray(filt(conv(f1) * conv(f2) * conv(f3), x=x))
            np.testing.assert_allclose(got, y, rtol=1e-5, atol=1e-7)
        # associativity of Biquad products through SOS
        a = as_biquad(f1) * (as_biquad(f2) * as_biquad(f3))
        b = (as_biquad(f1) * as_biquad(f2)) * as_biquad(f3)
        np.testing.assert_allclose(np.asarray(filt(a, x=x)), y,
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(np.asarray(filt(b, x=x)), y,
                                   rtol=1e-5, atol=1e-7)


class TestInversionExponentiation:
    @pytest.mark.parametrize("npc,npr,nzc,nzr",
                             [(0, 1, 0, 1), (1, 0, 1, 0), (2, 1, 1, 2),
                              (0, 2, 1, 0), (1, 2, 2, 1)])
    def test_inverse_and_powers(self, npc, npr, nzc, nzr):
        zc = (rng.random(nzc) - 0.5) + 1j * (rng.random(nzc) - 0.5)
        z = np.concatenate([zc, np.conj(zc), rng.random(nzr) - 0.5,
                            np.zeros(max(2 * npc + npr - 2 * nzc - nzr, 0))])
        pc = (rng.random(npc) - 0.5) + 1j * (rng.random(npc) - 0.5)
        p = np.concatenate([pc, np.conj(pc), rng.random(npr) - 0.5,
                            np.zeros(max(2 * nzc + nzr - 2 * npc - npr, 0))])
        H0 = ZeroPoleGain(z, p, (rng.random() + 0.5) * rng.choice([-1, 1]))
        convs = [as_polynomial_ratio, as_zpk, as_sos]
        if len(z) <= 2 and len(p) <= 2:
            convs.append(as_biquad)
        x = rng.standard_normal(100)
        for conv in convs:
            H = conv(H0)
            Hinv = H.inv()
            np.testing.assert_allclose(
                np.asarray(filt(Hinv, x=filt(H, x=x))), x,
                rtol=1e-6, atol=1e-8)
            for e in (1, 2, 3):
                He = H ** e
                yi = x
                for _ in range(e):
                    yi = filt(H, x=yi)
                np.testing.assert_allclose(np.asarray(filt(He, x=x)),
                                           np.asarray(yi), rtol=1e-6,
                                           atol=1e-8)
                np.testing.assert_allclose(
                    np.asarray(filt(H ** -e, x=filt(He, x=x))), x,
                    rtol=5e-6, atol=1e-7)
            np.testing.assert_allclose(np.asarray(filt(H ** 0, x=x)), x,
                                       rtol=1e-12)

    def test_large_negative_power_no_overflow(self):
        H = PolynomialRatio([1.0], [2.0]) ** (-128)
        np.testing.assert_allclose(coefb(H), [2.0 ** 128])
        np.testing.assert_allclose(coefa(H), [1.0])
        zpg = ZeroPoleGain([1], [2], 3) ** (-128)
        assert len(zpg.z) == len(zpg.p) == 128
        assert np.all(zpg.z == 2) and np.all(zpg.p == 1)
        assert np.isclose(zpg.k, (1 / 3) ** 128)
        bq = Biquad(1, 2, 3, 4, 5)
        sos1 = bq ** (-128)
        sos2 = SecondOrderSections([bq], 1.0) ** (-128)
        assert len(sos1.biquads) == len(sos2.biquads) == 128
        assert all(q == bq.inv() for q in sos1.biquads)
        assert all(q == bq.inv() for q in sos2.biquads)
        assert sos1.g == sos2.g == 1


class TestCoefAccessors:
    def test_biquad(self):
        B = Biquad(1, 2, 3, 4, 5)
        np.testing.assert_array_equal(coefa(B), [1, 4, 5])
        np.testing.assert_array_equal(coefb(B), [1, 2, 3])
        B = Biquad(20.0, 16, 13, 31, 33)
        np.testing.assert_array_equal(coefa(B), [1.0, 31, 33])
        np.testing.assert_array_equal(coefb(B), [20.0, 16, 13])

    def test_sos(self):
        B = SecondOrderSections([Biquad(2.0, 0, 0, 0, 0)] * 2, 0.25)
        np.testing.assert_array_equal(coefb(B), [1.0])
        np.testing.assert_array_equal(coefa(B), [1.0])
        B = SecondOrderSections([Biquad(0, 1, 0, 0, 0)] * 2, 1)
        np.testing.assert_array_equal(coefb(B), [0, 0, 1])
        np.testing.assert_array_equal(coefa(B), [1])

    def test_zpk(self):
        f = ZeroPoleGain([0], [-1, 1], 1)
        np.testing.assert_array_equal(coefa(f), [1, 0, -1])
        np.testing.assert_array_equal(coefb(f), [0, 1])
        f = ZeroPoleGain([], [-0.25, 0.25], 1)
        np.testing.assert_allclose(coefa(f), [1.0, 0, -1 / 16])
        np.testing.assert_allclose(coefb(f), [0.0, 0.0, 1.0])


class TestErrors:
    @pytest.mark.parametrize("z,p", [
        ([0.5 + 0.5j, 0.5 + 0.5j], [0.5 + 0.5j, 0.5 - 0.5j]),
        ([0.5 + 0.5j, 0.5 - 0.5j], [0.5 + 0.5j, 0.5 + 0.5j]),
        ([1 + 1j, 1 + 1j, 1 - 1j], [1, 0, 0]),
        ([1 + 1j, 1 - 1j, 1 - 1j], [1, 0, 0]),
    ])
    def test_unpaired_conjugates_raise(self, z, p):
        with pytest.raises(ValueError):
            as_sos(ZeroPoleGain(z, p, 1))

    def test_biquad_of_higher_order_raises(self):
        f1 = digitalfilter(Lowpass(0.3), Butterworth(2))
        f2 = digitalfilter(Highpass(0.5), Butterworth(1))
        with pytest.raises(ValueError):
            as_biquad(as_sos(f1 * f2))

    def test_zero_denominator_raises(self):
        with pytest.raises(ValueError):
            PolynomialRatio([1.0, 2.0], [0.0, 4.0])
        with pytest.raises(ValueError):
            Biquad(0.0, 1.0, 2.0, 3.0, 4.0).inv()
