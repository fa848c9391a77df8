"""Multitaper tests (reference test/multitaper.jl: MNE-python golden
fixtures + synthetic coherence orderings + internal consistency)."""

import numpy as np
import pytest

from dsptpu.ops.multitaper import (MTConfig, dpss_config, mt_pgram,
                                   mt_spectrogram, mt_cross_power_spectra,
                                   mt_coherence)
from dsptpu.ops.periodograms import periodogram, spectrogram, power, freq
from helpers import read_reference_data

FS = 1000.0
N = 1024
T_AX = np.arange(N) / FS
SIN1 = np.sin(np.pi * 2 * 12.0 * T_AX)       # 12 Hz
SIN2 = np.sin(np.pi * (2 * 12.0 * T_AX + 1))  # 12 Hz phase-shifted


def avg_coh(c):
    return np.mean(np.asarray(c.coherence), axis=2)


class TestGoldenMNE:
    def test_cross_power_spectra(self):
        want_f = read_reference_data("csd_array_multitaper_frequencies.txt")
        re = read_reference_data("csd_array_multitaper_values_re.txt")
        im = read_reference_data("csd_array_multitaper_values_im.txt")
        want = (re + 1j * im).reshape((2, 2, 512), order="F")
        signal = np.stack([SIN1, SIN2])
        config = dpss_config(N, fs=FS, keep_only_large_evals=True,
                             weight_by_evals=True)
        result = mt_cross_power_spectra(signal, demean=True, config=config)
        np.testing.assert_allclose(result.freq[1:], want_f, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(result.power)[:, :, 1:], want,
                                   rtol=1e-6, atol=1e-12)

    def test_coherence_reference_value(self):
        # reference test/multitaper.jl "mt_coherence reference test"
        noise = read_reference_data("noise.txt")
        sig = np.stack([SIN1, SIN1 + 3 * noise])
        config = dpss_config(N, fs=FS, keep_only_large_evals=True,
                             weight_by_evals=True)
        coh = avg_coh(mt_coherence(sig, demean=True, freq_range=(10, 15),
                                   config=config))
        np.testing.assert_allclose(coh[1, 0], 0.982356762670818, rtol=1e-7)


class TestCoherenceSynthetic:
    freq_range = (10, 15)

    def _coh(self, sig, **kw):
        return avg_coh(mt_coherence(sig, fs=FS, freq_range=self.freq_range,
                                    **kw))[1, 0]

    def test_orderings(self):
        noise = read_reference_data("noise.txt")
        same = self._coh(np.stack([SIN1, SIN1]), demean=True)
        assert abs(same - 1) < 1e-5
        phase = self._coh(np.stack([SIN1, SIN2]))
        assert abs(phase - 1) < 1e-5  # pure phase shift keeps coherence
        diff = self._coh(np.stack([SIN1, noise]))
        less = self._coh(np.stack([SIN1, SIN1 + noise]))
        more = self._coh(np.stack([SIN1, SIN1 + 3 * noise]))
        assert less < same
        assert more < less
        assert diff < more

    def test_diagonal_and_symmetry(self):
        noise = read_reference_data("noise.txt")
        sig = np.stack([SIN1, SIN2, noise])
        c = np.asarray(mt_coherence(sig, fs=FS).coherence)
        np.testing.assert_allclose(c[np.arange(3), np.arange(3), :], 1.0)
        np.testing.assert_allclose(c, np.swapaxes(c, 0, 1), atol=1e-12)
        assert c.shape[2] == len(np.fft.rfftfreq(1024))


class TestMTPgram:
    def test_single_rect_taper_equals_periodogram(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal(256)
        win = np.ones((256, 1))
        p_mt = mt_pgram(x, fs=2.0, window=win, nfft=256)
        p_ref = periodogram(x, fs=2.0, nfft=256)
        np.testing.assert_allclose(np.asarray(power(p_mt)),
                                   np.asarray(power(p_ref)),
                                   rtol=1e-9, atol=1e-12)

    def test_peak_at_signal_freq(self):
        p = mt_pgram(SIN1, fs=FS)
        P, F = np.asarray(power(p)), np.asarray(freq(p))
        assert abs(F[np.argmax(P)] - 12.0) < 1.5

    def test_parseval(self):
        # total power ~ mean square (DPSS tapers, averaged)
        rng = np.random.default_rng(1)
        x = rng.standard_normal(512)
        p = mt_pgram(x, fs=1.0)
        total = np.sum(np.asarray(power(p))) / 512
        np.testing.assert_allclose(total, np.mean(x ** 2), rtol=0.15)


class TestMTSpectrogram:
    def test_shape_and_time(self):
        rng = np.random.default_rng(2)
        x = rng.standard_normal(2000)
        s = mt_spectrogram(x, 256, 128, fs=FS)
        P = np.asarray(power(s))
        k = (2000 - 256) // 128 + 1
        assert P.shape == (len(np.fft.rfftfreq(256)), k)
        t = np.asarray(s.time)
        np.testing.assert_allclose(t[0], (256 / 2) / FS)

    def test_single_taper_matches_spectrogram(self):
        rng = np.random.default_rng(3)
        x = rng.standard_normal(1000)
        win = np.hanning(128)[:, None]
        s_mt = mt_spectrogram(x, 128, 64, fs=2.0, window=win, nfft=128)
        s_ref = spectrogram(x, 128, 64, fs=2.0, window=win[:, 0], nfft=128)
        np.testing.assert_allclose(np.asarray(power(s_mt)),
                                   np.asarray(power(s_ref)),
                                   rtol=1e-9, atol=1e-12)

    def test_config_validation(self):
        with pytest.raises(ValueError):
            MTConfig.create(100, fs=-1)
        with pytest.raises(ValueError):
            MTConfig.create(100, nfft=50)
        with pytest.raises(ValueError):
            MTConfig.create(-5)
