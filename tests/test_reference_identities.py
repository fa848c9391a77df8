"""Analytic-identity tests ported from the reference suite
(test/util.jl, test/periodograms.jl "0:7", test/multitaper.jl
coherence properties) — behaviors not pinned by golden fixtures."""

import numpy as np
import jax.numpy as jnp

import dsptpu

rng = np.random.default_rng(1776)


class TestHilbertIdentities:
    def test_unit_circle_phases(self):
        t = np.arange(0, 2, 1 / 256.0)
        a = np.column_stack([np.sin(np.pi * t), np.cos(np.pi * t),
                             np.sin(2 * np.pi * t), np.cos(2 * np.pi * t)])
        h = np.asarray(dsptpu.hilbert(jnp.asarray(a)))
        np.testing.assert_allclose(h.real, a, atol=1e-9)
        np.testing.assert_allclose(np.abs(h), 1.0, atol=1e-9)
        # imag(hilbert(cos)) == sin
        np.testing.assert_allclose(h[:, 1].imag, a[:, 0], atol=1e-9)

    def test_odd_length_and_int_input(self):
        x = np.r_[np.ones(10), np.zeros(9)]
        np.testing.assert_allclose(
            np.asarray(dsptpu.hilbert(jnp.asarray(x))).real, x, atol=1e-9)
        r = rng.integers(1, 20, 128)
        # int input promotes via fftintype (float32 on-device policy),
        # so match at f32 tolerance rather than the reference's exact
        # f64 equality
        np.testing.assert_allclose(
            np.asarray(dsptpu.hilbert(jnp.asarray(r))),
            np.asarray(dsptpu.hilbert(jnp.asarray(r.astype(np.float64)))),
            rtol=1e-5, atol=1e-4)


class TestPeriodogramIdentities:
    """Reference test/periodograms.jl '0:7' testset."""

    data = np.arange(8.0)
    data0 = np.abs(np.fft.fft(np.arange(8.0))) ** 2 / 8

    def test_single_segment_equals_fft(self):
        P = dsptpu.power
        np.testing.assert_allclose(
            np.asarray(P(dsptpu.periodogram(self.data, onesided=False))),
            self.data0, atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(P(dsptpu.welch_pgram(self.data, 8, 0,
                                            onesided=False))),
            self.data0, atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(P(dsptpu.spectrogram(self.data, 8, 0,
                                            onesided=False))).ravel(),
            self.data0, atol=1e-12)

    def test_complex_doubles(self):
        cd = self.data + 1j * self.data
        np.testing.assert_allclose(
            np.asarray(dsptpu.power(dsptpu.periodogram(cd,
                                                       onesided=False))),
            self.data0 * 2, atol=1e-12)

    def test_welch_segment_means(self):
        for n_, o_ in ((2, 0), (3, 0), (3, 1), (4, 1)):
            hop = n_ - o_
            segs = [self.data[s:s + n_] for s in range(0, 9, hop)
                    if s + n_ <= 8]
            want = np.mean([np.abs(np.fft.fft(s)) ** 2 / n_
                            for s in segs], axis=0)
            got = np.asarray(dsptpu.power(
                dsptpu.welch_pgram(self.data, n_, o_, onesided=False)))
            np.testing.assert_allclose(got, want, atol=1e-12)

    def test_nfft_zero_padding(self):
        want = np.abs(np.fft.rfft(self.data, 32)) ** 2 / 8
        want[1:-1] *= 2
        got = np.asarray(dsptpu.power(dsptpu.periodogram(self.data,
                                                         nfft=32)))
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_window_callable_equals_array(self):
        w = np.asarray(dsptpu.windows.hamming(8))
        p1 = np.asarray(dsptpu.power(dsptpu.periodogram(
            self.data, window=dsptpu.windows.hamming, onesided=False)))
        p2 = np.asarray(dsptpu.power(dsptpu.periodogram(
            self.data, window=w, onesided=False)))
        np.testing.assert_allclose(p1, p2, atol=1e-12)

    def test_fftshift_tfr(self):
        cd = self.data + 1j * self.data
        p = dsptpu.periodogram(cd, onesided=False)
        ps = dsptpu.fftshift_tfr(p)
        np.testing.assert_allclose(
            np.fft.fftshift(np.asarray(dsptpu.power(p))),
            np.asarray(dsptpu.power(ps)))
        np.testing.assert_allclose(
            np.fft.fftshift(np.asarray(dsptpu.freq(p))),
            np.asarray(dsptpu.freq(ps)))


class TestCoherenceProperties:
    """Reference test/multitaper.jl coherence semantics."""

    fs = 100.0
    n = 2048

    def _line(self, phase=0.0, noise=0.1, seed=1):
        r = np.random.default_rng(seed)
        t = np.arange(self.n) / self.fs
        return (np.sin(2 * np.pi * 12.5 * t + phase)
                + noise * r.standard_normal(self.n))

    def test_same_signal_is_one(self):
        s = self._line()
        coh = np.asarray(dsptpu.coherence(
            dsptpu.mt_coherence(np.stack([s, s]), fs=self.fs)))
        assert abs(float(np.mean(coh[0, 1])) - 1) < 0.05
        np.testing.assert_allclose(coh[0, 0], 1.0)
        np.testing.assert_allclose(coh[0, 1], coh[1, 0])

    def test_phase_shift_keeps_coherence(self):
        c = dsptpu.mt_coherence(
            np.stack([self._line(), self._line(phase=1.0, seed=2)]),
            fs=self.fs, freq_range=(10, 15))
        coh = np.asarray(dsptpu.coherence(c))
        assert float(np.max(coh[0, 1])) > 0.9
        f = np.asarray(c.freq)
        assert f.min() > 10 and f.max() < 15

    def test_noise_ordering(self):
        # coherence AT THE LINE decreases with added noise (reference
        # less_noisy > more_noisy > different_signal ordering)
        s = self._line(noise=0.0)
        def line_coh(other):
            c = dsptpu.mt_coherence(np.stack([s, other]), fs=self.fs,
                                    freq_range=(11, 14))
            return float(np.max(np.asarray(dsptpu.coherence(c))[0, 1]))
        less_noisy = line_coh(s + 0.5 * np.random.default_rng(
            3).standard_normal(self.n))
        more_noisy = line_coh(s + 4.0 * np.random.default_rng(
            4).standard_normal(self.n))
        different = line_coh(
            np.random.default_rng(5).standard_normal(self.n))
        assert more_noisy < less_noisy
        assert different < less_noisy


class TestEnergyIdentities:
    """Normalization invariants that pin the fft2pow bookkeeping
    (reference periodograms.jl:142-172) independently of scipy."""

    def test_periodogram_parseval(self):
        # sum(PSD) * fs / nfft == mean power (two-sided, no window)
        rng2 = np.random.default_rng(11)
        x = rng2.standard_normal(4096)
        p = dsptpu.periodogram(x, onesided=False, fs=2.5)
        total = float(np.sum(np.asarray(dsptpu.power(p)))) * 2.5 / 4096
        np.testing.assert_allclose(total, np.mean(x ** 2), rtol=1e-9)

    def test_welch_parseval_rect_nonoverlap(self):
        # rect window, non-overlapping segments: welch == mean of
        # per-segment periodograms, so Parseval holds segment-wise
        rng2 = np.random.default_rng(12)
        x = rng2.standard_normal(8192)
        p = dsptpu.welch_pgram(x, 1024, 0, onesided=False)
        total = float(np.sum(np.asarray(dsptpu.power(p)))) / 1024
        np.testing.assert_allclose(total, np.mean(x ** 2), rtol=1e-9)

    def test_resample_preserves_tone(self):
        # a clean tone lands on the right frequency after 147//160
        from fractions import Fraction
        fs_in, f0 = 48000.0, 1000.0
        n = 48000
        t = np.arange(n) / fs_in
        x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
        y = np.asarray(dsptpu.resample(x, Fraction(147, 160)))
        fs_out = fs_in * 147 / 160
        seg = y[2000:2000 + 16384]
        F = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
        peak = np.argmax(F) * fs_out / len(seg)
        assert abs(peak - f0) < fs_out / len(seg) * 1.5, peak
