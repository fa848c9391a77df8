"""Sharded-op tests on a virtual 8-device CPU mesh: sharded results
must match the single-device implementations exactly (no reference
analogue — SURVEY.md §2.10)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy import signal as sp

from dsptpu.parallel import make_mesh, shard_fir, shard_fftfilt, shard_welch, \
    shard_sosfilt
from dsptpu.ops.periodograms import welch_pgram, power
from dsptpu.ops import windows
from dsptpu.filters import sosfilt

rng = np.random.default_rng(1776)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def mesh():
    return make_mesh((1, 8))


@pytest.fixture(scope="module")
def mesh2d():
    return make_mesh((2, 4))


class TestShardFIR:
    def test_matches_lfilter(self, mesh):
        b = rng.standard_normal(31)
        x = rng.standard_normal(4096)
        got = np.asarray(shard_fir(b, x, mesh))
        np.testing.assert_allclose(got, sp.lfilter(b, [1.0], x), atol=1e-10)

    def test_long_taps_os_path(self, mesh):
        b = rng.standard_normal(300)
        x = rng.standard_normal(8192)
        got = np.asarray(shard_fftfilt(b, x, mesh))
        np.testing.assert_allclose(got, sp.lfilter(b, [1.0], x), atol=1e-8)

    def test_channel_sharded_2d(self, mesh2d):
        b = rng.standard_normal(63)
        x = rng.standard_normal((2048, 8))
        got = np.asarray(shard_fir(b, x, mesh2d, channel_axis="channel"))
        np.testing.assert_allclose(got, sp.lfilter(b, [1.0], x, axis=0),
                                   atol=1e-10)


class TestShardWelch:
    def test_matches_welch(self, mesh):
        n, noverlap = 256, 128
        x = rng.standard_normal(8192)
        win = np.asarray(windows.hanning(n))
        psd, freqs = shard_welch(x, n, noverlap, win, mesh, fs=2.0)
        ref = welch_pgram(x, n, noverlap, window=win, fs=2.0)
        np.testing.assert_allclose(np.asarray(psd), np.asarray(power(ref)),
                                   rtol=1e-9, atol=1e-12)

    def test_multichannel(self, mesh2d):
        n, noverlap = 128, 64
        x = rng.standard_normal((4096, 4))
        win = np.asarray(windows.hamming(n))
        psd, _ = shard_welch(x, n, noverlap, win, mesh2d,
                             channel_axis="channel")
        ref = welch_pgram(x, n, noverlap, window=win)
        np.testing.assert_allclose(np.asarray(psd), np.asarray(power(ref)),
                                   rtol=1e-9, atol=1e-12)


class TestShardSOS:
    def test_matches_sosfilt(self, mesh):
        sos_sp = sp.butter(8, 0.2, output="sos")
        ours = np.column_stack([sos_sp[:, :3], sos_sp[:, 4:]])
        x = rng.standard_normal(4096)
        got = np.asarray(shard_sosfilt(ours, 1.0, x, mesh))
        want = sp.sosfilt(sos_sp, x)
        np.testing.assert_allclose(got, want, atol=1e-9)

    def test_multichannel(self, mesh2d):
        sos_sp = sp.butter(4, 0.35, output="sos")
        ours = np.column_stack([sos_sp[:, :3], sos_sp[:, 4:]])
        x = rng.standard_normal((2048, 4))
        got = np.asarray(shard_sosfilt(ours, 1.0, x, mesh2d,
                                       channel_axis="channel"))
        want = sp.sosfilt(sos_sp, x, axis=0)
        np.testing.assert_allclose(got, want, atol=1e-9)


class TestShardFiltfilt:
    def test_matches_filtfilt(self, mesh):
        from dsptpu.parallel import shard_filtfilt
        from dsptpu.filters import (Butterworth, Lowpass, digitalfilter,
                                    filtfilt, as_sos)
        from dsptpu.filters.filt import _sos_arrays
        f = digitalfilter(Lowpass(0.2), Butterworth(8))
        sos, g = _sos_arrays(as_sos(f))
        x = rng.standard_normal(8 * 512)
        got = np.asarray(shard_filtfilt(sos, g, x, mesh))
        want = np.asarray(filtfilt(f, x=jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=1e-10)

    def test_multichannel(self, mesh2d):
        from dsptpu.parallel import shard_filtfilt
        from dsptpu.filters import (Butterworth, Bandpass, digitalfilter,
                                    filtfilt, as_sos)
        from dsptpu.filters.filt import _sos_arrays
        f = digitalfilter(Bandpass(0.15, 0.4), Butterworth(3))
        sos, g = _sos_arrays(as_sos(f))
        x = rng.standard_normal((4 * 512, 4))
        got = np.asarray(shard_filtfilt(sos, g, x, mesh2d,
                                        channel_axis="channel"))
        want = np.asarray(filtfilt(f, x=jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=1e-10)


class TestShardSpectrogram:
    def test_matches_spectrogram(self, mesh):
        from dsptpu.parallel import shard_spectrogram
        from dsptpu.ops.periodograms import spectrogram
        n, noverlap = 128, 64
        x = rng.standard_normal(4096)
        win = np.asarray(windows.hanning(n))
        pw, freqs, t = shard_spectrogram(x, n, noverlap, win, mesh)
        ref = spectrogram(x, n, noverlap, window=win)
        k = np.asarray(ref.power).shape[1]
        # sharded output is (nseg_padded, nfreq); invalid rows are zero
        got = np.asarray(pw)[:k]
        np.testing.assert_allclose(got, np.asarray(ref.power).T,
                                   rtol=1e-9, atol=1e-12)
        assert np.all(np.asarray(pw)[k:] == 0)
        np.testing.assert_allclose(freqs, np.asarray(ref.freq))

    def test_multichannel(self, mesh2d):
        from dsptpu.parallel import shard_spectrogram
        from dsptpu.ops.periodograms import spectrogram
        n, noverlap = 64, 32
        x = rng.standard_normal((2048, 4))
        win = np.asarray(windows.hamming(n))
        pw, freqs, t = shard_spectrogram(x, n, noverlap, win, mesh2d,
                                         channel_axis="channel")
        ref = spectrogram(x, n, noverlap, window=win)
        k = np.asarray(ref.power).shape[1]
        np.testing.assert_allclose(np.asarray(pw)[:k],
                                   np.moveaxis(np.asarray(ref.power), 0, 1),
                                   rtol=1e-9, atol=1e-12)


class TestShardSOSPrefix:
    def test_long_cascade_many_shards(self, mesh):
        # exercises the log-depth ppermute prefix with nsh=8
        sos_sp = sp.butter(6, [0.2, 0.5], btype="band", output="sos")
        ours = np.column_stack([sos_sp[:, :3], sos_sp[:, 4:]])
        x = rng.standard_normal(8192)
        got = np.asarray(shard_sosfilt(ours, 2.5, x, mesh))
        want = sp.sosfilt(sos_sp, x) * 2.5
        np.testing.assert_allclose(got, want, atol=1e-9)


class TestShardResample:
    @pytest.mark.parametrize("ratio", ["147/160", "3/2", "1/4", "5"])
    def test_matches_firfilter(self, mesh, ratio):
        from fractions import Fraction
        from dsptpu.parallel.ops import shard_resample, compact_shards
        from dsptpu.filters.stream_filt import FIRFilter
        from dsptpu.filters import resample_filter
        import jax.numpy as jnp
        ratio = Fraction(ratio)
        h = np.asarray(resample_filter(ratio))
        x = rng.standard_normal(8000)
        y, cnt = shard_resample(h, ratio, x, mesh)
        got = np.asarray(compact_shards(y, cnt))
        ref = np.asarray(FIRFilter(h, ratio).filt(jnp.asarray(x)))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=1e-10)

    def test_multichannel(self, mesh2d):
        from fractions import Fraction
        from dsptpu.parallel.ops import shard_resample, compact_shards
        from dsptpu.filters.stream_filt import FIRFilter
        from dsptpu.filters import resample_filter
        import jax.numpy as jnp
        ratio = Fraction(3, 2)
        h = np.asarray(resample_filter(ratio))
        x = rng.standard_normal((4000, 4))
        y, cnt = shard_resample(h, ratio, x, mesh2d,
                                channel_axis="channel")
        got = np.asarray(compact_shards(y, cnt))
        ref = np.asarray(FIRFilter(h, ratio).filt(jnp.asarray(x)))
        np.testing.assert_allclose(got, ref, atol=1e-10)


class TestShardMTSpectrogram:
    def test_matches_mt_spectrogram(self, mesh):
        from dsptpu.parallel import shard_mt_spectrogram
        from dsptpu.ops.multitaper import MTConfig, mt_spectrogram
        import jax.numpy as jnp
        n, noverlap = 128, 64
        x = rng.standard_normal(4096)
        cfg = MTConfig.create(n, nw=2, nfft=n)
        pw = shard_mt_spectrogram(x, cfg, noverlap, mesh)
        ref = mt_spectrogram(jnp.asarray(x), config=cfg, n_overlap=noverlap)
        k = np.asarray(ref.power).shape[1]
        np.testing.assert_allclose(np.asarray(pw)[:k],
                                   np.asarray(ref.power).T,
                                   rtol=1e-9, atol=1e-12)
        assert np.all(np.asarray(pw)[k:] == 0)


class TestOddLengthAutopad:
    """Arbitrary (non-divisible, odd) lengths must work on any mesh:
    the sharded ops zero-pad internally and mask/slice the tails."""

    def test_shard_fir_odd(self, mesh):
        b = rng.standard_normal(31)
        x = rng.standard_normal(4097)
        got = np.asarray(shard_fir(b, x, mesh))
        np.testing.assert_allclose(got, sp.lfilter(b, [1.0], x), atol=1e-10)

    def test_shard_sosfilt_odd(self, mesh):
        sos_sp = sp.butter(4, 0.3, output="sos")
        ours = np.column_stack([sos_sp[:, :3], sos_sp[:, 4:]])
        x = rng.standard_normal(3001)
        got = np.asarray(shard_sosfilt(ours, 1.0, x, mesh))
        np.testing.assert_allclose(got, sp.sosfilt(sos_sp, x), atol=1e-9)

    @pytest.mark.parametrize("n_sig", [4097, 5000, 1000])
    def test_shard_welch_odd(self, mesh, n_sig):
        n, noverlap = 256, 128
        x = rng.standard_normal(n_sig)
        win = np.asarray(windows.hanning(n))
        psd, freqs = shard_welch(x, n, noverlap, win, mesh, fs=2.0)
        ref = welch_pgram(x, n, noverlap, window=win, fs=2.0)
        np.testing.assert_allclose(np.asarray(psd), np.asarray(power(ref)),
                                   rtol=1e-6, atol=1e-10)

    def test_shard_spectrogram_odd(self, mesh):
        from dsptpu.parallel import shard_spectrogram
        from dsptpu.ops.periodograms import spectrogram
        n, noverlap = 128, 64
        x = rng.standard_normal(4100)
        win = np.asarray(windows.hanning(n))
        pw, freqs, t = shard_spectrogram(x, n, noverlap, win, mesh)
        ref = spectrogram(x, n, noverlap, window=win)
        k = np.asarray(ref.power).shape[1]
        np.testing.assert_allclose(np.asarray(pw)[:k],
                                   np.asarray(ref.power).T,
                                   rtol=1e-9, atol=1e-12)
        assert np.all(np.asarray(pw)[k:] == 0)

    @pytest.mark.parametrize("n_sig", [3001, 4097])
    def test_shard_filtfilt_odd(self, mesh, n_sig):
        from dsptpu.parallel import shard_filtfilt
        from dsptpu.filters import (Butterworth, Lowpass, digitalfilter,
                                    filtfilt, as_sos)
        from dsptpu.filters.filt import _sos_arrays
        f = digitalfilter(Lowpass(0.2), Butterworth(8))
        sos, g = _sos_arrays(as_sos(f))
        x = rng.standard_normal(n_sig)
        got = np.asarray(shard_filtfilt(sos, g, x, mesh))
        want = np.asarray(filtfilt(f, x=jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=1e-8)

    def test_shard_filtfilt_odd_multichannel(self, mesh2d):
        from dsptpu.parallel import shard_filtfilt
        from dsptpu.filters import (Butterworth, Bandpass, digitalfilter,
                                    filtfilt, as_sos)
        from dsptpu.filters.filt import _sos_arrays
        f = digitalfilter(Bandpass(0.15, 0.4), Butterworth(3))
        sos, g = _sos_arrays(as_sos(f))
        x = rng.standard_normal((2050, 4))
        got = np.asarray(shard_filtfilt(sos, g, x, mesh2d,
                                        channel_axis="channel"))
        want = np.asarray(filtfilt(f, x=jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=1e-8)

    def test_shard_filtfilt_tiny(self, mesh):
        # n < one 128-block per shard: most shards are pure padding
        from dsptpu.parallel import shard_filtfilt
        from dsptpu.filters import (Butterworth, Lowpass, digitalfilter,
                                    filtfilt, as_sos)
        from dsptpu.filters.filt import _sos_arrays
        f = digitalfilter(Lowpass(0.3), Butterworth(4))
        sos, g = _sos_arrays(as_sos(f))
        x = rng.standard_normal(200)
        got = np.asarray(shard_filtfilt(sos, g, x, mesh))
        want = np.asarray(filtfilt(f, x=jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=1e-8)

    def test_shard_resample_odd(self, mesh):
        from fractions import Fraction
        from dsptpu.parallel.ops import shard_resample, compact_shards
        from dsptpu.filters.stream_filt import FIRFilter
        from dsptpu.filters import resample_filter
        ratio = Fraction(3, 2)
        h = np.asarray(resample_filter(ratio))
        x = rng.standard_normal(8001)
        y, cnt = shard_resample(h, ratio, x, mesh)
        got = np.asarray(compact_shards(y, cnt))
        ref = np.asarray(FIRFilter(h, ratio).filt(jnp.asarray(x)))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=1e-10)

    def test_shard_mt_spectrogram_odd(self, mesh):
        from dsptpu.parallel import shard_mt_spectrogram
        from dsptpu.ops.multitaper import MTConfig, mt_spectrogram
        n, noverlap = 128, 64
        x = rng.standard_normal(4099)
        cfg = MTConfig.create(n, nw=2, nfft=n)
        pw = shard_mt_spectrogram(x, cfg, noverlap, mesh)
        ref = mt_spectrogram(jnp.asarray(x), config=cfg, n_overlap=noverlap)
        k = np.asarray(ref.power).shape[1]
        np.testing.assert_allclose(np.asarray(pw)[:k],
                                   np.asarray(ref.power).T,
                                   rtol=1e-9, atol=1e-12)
        assert np.all(np.asarray(pw)[k:] == 0)


class TestShardMTCrossSpectra:
    """Taper-sharded cross power spectra / coherence must match the
    unsharded ops exactly (tapers pad with zero weight; psum over the
    shard axis reassembles the full taper sum)."""

    def test_matches_cross_power_spectra(self, mesh):
        from dsptpu.parallel import shard_mt_cross_power_spectra
        from dsptpu.ops.multitaper import mt_cross_power_spectra
        x = rng.standard_normal((4, 1024))
        got = shard_mt_cross_power_spectra(x, mesh, nw=4)  # 7 tapers: pads
        ref = mt_cross_power_spectra(jnp.asarray(x), nw=4)
        np.testing.assert_allclose(np.asarray(got.power),
                                   np.asarray(ref.power),
                                   rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(np.asarray(got.freq),
                                   np.asarray(ref.freq))

    def test_divisible_tapers_freq_range_demean(self, mesh):
        from dsptpu.parallel import shard_mt_cross_power_spectra
        from dsptpu.ops.multitaper import (mt_cross_power_spectra,
                                           MTCrossSpectraConfig)
        x = rng.standard_normal((3, 512)) + 0.7
        cfg = MTCrossSpectraConfig.create(
            3, 512, fs=2.0, demean=True, freq_range=(0.1, 0.8),
            ntapers=8, nw=5)
        got = shard_mt_cross_power_spectra(x, mesh, config=cfg)
        ref = mt_cross_power_spectra(jnp.asarray(x), config=cfg)
        assert got.power.shape == ref.power.shape
        np.testing.assert_allclose(np.asarray(got.power),
                                   np.asarray(ref.power),
                                   rtol=1e-9, atol=1e-12)

    def test_coherence(self, mesh):
        from dsptpu.parallel import shard_mt_coherence
        from dsptpu.ops.multitaper import mt_coherence
        n = 2048
        t = np.arange(n)
        common = np.sin(2 * np.pi * 0.07 * t)
        x = np.stack([common + 0.3 * rng.standard_normal(n),
                      common + 0.3 * rng.standard_normal(n),
                      rng.standard_normal(n)])
        got = shard_mt_coherence(x, mesh, nw=4)
        ref = mt_coherence(jnp.asarray(x), nw=4)
        np.testing.assert_allclose(np.asarray(got.coherence),
                                   np.asarray(ref.coherence),
                                   rtol=1e-8, atol=1e-10)
