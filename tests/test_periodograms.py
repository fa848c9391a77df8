import numpy as np
import pytest

from dsptpu.ops import windows as W
from dsptpu.ops.periodograms import (arraysplit, periodogram, welch_pgram,
                                     spectrogram, stft, WelchConfig,
                                     power, freq, tfr_time, fftshift_tfr)
from helpers import read_reference_data

DATA = np.arange(8.0)


def test_arraysplit():
    frames = np.asarray(arraysplit(np.arange(1.0, 9.0), 3, 1))
    # hop 2: [1,2,3],[3,4,5],[5,6,7] (k = (8-3)//2+1 = 3)
    np.testing.assert_array_equal(frames,
                                  [[1, 2, 3], [3, 4, 5], [5, 6, 7]])
    # padding + window
    frames = np.asarray(arraysplit(np.arange(1.0, 9.0), 3, 1, nfft=4,
                                   window=np.array([1.0, 2.0, 0.5])))
    np.testing.assert_array_equal(frames[0], [1, 4, 1.5, 0])
    with pytest.raises(ValueError):
        arraysplit(np.arange(8.0), 3, 3)
    with pytest.raises(ValueError):
        arraysplit(np.arange(8.0), 3, 1, nfft=2)


# MATLAB pwelch reference vectors (same as used by the reference suite)
TWOSIDED_8 = [98.0, 13.656854249492380, 4.0, 2.343145750507620, 2.0,
              2.343145750507620, 4.0, 13.656854249492380]


def test_periodogram_twosided_matlab():
    np.testing.assert_allclose(power(periodogram(DATA, onesided=False)),
                               TWOSIDED_8, rtol=1e-12)
    np.testing.assert_allclose(
        power(welch_pgram(DATA, 8, 0, onesided=False)), TWOSIDED_8, rtol=1e-12)
    np.testing.assert_allclose(
        power(spectrogram(DATA, 8, 0, onesided=False)).squeeze(), TWOSIDED_8,
        rtol=1e-12)
    # complex doubling
    np.testing.assert_allclose(
        power(periodogram(DATA + 1j * DATA, onesided=False)),
        np.array(TWOSIDED_8) * 2, rtol=1e-12)


def test_welch_segments_matlab():
    cases = [
        (2, 0, [34.5, 0.5]),
        (3, 0, [25.5, 1.0, 1.0]),
        (3, 1, [35.0, 1.0, 1.0]),
        (4, 1, [45.0, 2.0, 1.0, 2.0]),
    ]
    for n, nov, expected in cases:
        np.testing.assert_allclose(
            power(welch_pgram(DATA, n, nov, onesided=False)), expected,
            rtol=1e-12)
        sp = power(spectrogram(DATA, n, nov, onesided=False))
        np.testing.assert_allclose(np.mean(sp, axis=1), expected, rtol=1e-12)


def test_windowed_periodogram_matlab():
    hamming_exp = [65.461623986801527, 20.556791795515764, 0.369313143650544,
                   0.022167446610882, 0.025502985564107, 0.022167446610882,
                   0.369313143650544, 20.556791795515764]
    bartlett_exp = [62.999999999999993, 21.981076052592442, 0.285714285714286,
                    0.161781090264695, 0.142857142857143, 0.161781090264695,
                    0.285714285714286, 21.981076052592442]
    for win, expected in ((W.hamming, hamming_exp), (W.bartlett, bartlett_exp)):
        np.testing.assert_allclose(
            power(periodogram(DATA, window=win, onesided=False)), expected,
            rtol=1e-10)
        np.testing.assert_allclose(
            power(periodogram(DATA, window=win(8), onesided=False)), expected,
            rtol=1e-10)
        np.testing.assert_allclose(
            power(welch_pgram(DATA, 8, 0, window=win, onesided=False)),
            expected, rtol=1e-10)


def test_padded_periodogram_matlab():
    expected = [98, 174.463067389405, 121.968086934209, 65.4971744936088,
                27.3137084989848, 12.1737815028909, 10.3755170959439,
                10.4034038628775, 8, 5.25810953219633, 4.47015397150535,
                4.89522578856669, 4.68629150101524, 3.69370284475603,
                3.1862419983415, 3.61553458569862, 2]
    np.testing.assert_allclose(power(periodogram(DATA, nfft=32)), expected,
                               rtol=1e-10)
    hamming_expected = [65.4616239868015, 122.101693164395, 98.8444689598445,
                        69.020252632913, 41.1135835910315, 20.5496474310966,
                        8.43291449161938, 2.78001620362588, 0.738626287301088,
                        0.174995741770789, 0.0501563022944516, 0.0327357460012861,
                        0.0443348932217643, 0.0553999745503552, 0.0561319901616643,
                        0.0526025934871384, 0.0255029855641069]
    np.testing.assert_allclose(
        power(periodogram(DATA, window=W.hamming, nfft=32)), hamming_expected,
        rtol=1e-10)
    # config object path
    config = WelchConfig.create(data=DATA, n=8, noverlap=0, window=W.hamming,
                                nfft=32)
    np.testing.assert_allclose(power(welch_pgram(DATA, config=config)),
                               hamming_expected, rtol=1e-10)


def test_spectrogram_matlab_fixture():
    x0 = read_reference_data("spectrogram_x.txt")
    f0 = read_reference_data("spectrogram_f.txt")
    t0 = read_reference_data("spectrogram_t.txt")
    p0 = read_reference_data("spectrogram_p.txt")
    spec = spectrogram(x0, 256, 128, fs=10)
    np.testing.assert_allclose(power(spec), p0, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(freq(spec), f0, atol=1e-12)
    np.testing.assert_allclose(tfr_time(spec), t0, atol=1e-12)


def test_stft_matlab_fixture():
    fs, nfft, nwin, nhop = 16000, 512, 400, 160
    s = read_reference_data("stft_x.txt")
    S = np.asarray(stft(s, nwin, nwin - nhop, nfft=nfft, fs=fs,
                        window=W.hanning))
    S_ref = (read_reference_data("stft_S_real.txt")
             + 1j * read_reference_data("stft_S_imag.txt"))
    assert S.shape == S_ref.shape
    np.testing.assert_allclose(S, S_ref, rtol=1e-7, atol=1e-9)


def test_periodogram_2d():
    data2d = read_reference_data("per2dx.txt")
    expectedsum = read_reference_data("per2dsum.txt")
    expectedmean = read_reference_data("per2dmean.txt")
    np.testing.assert_allclose(power(periodogram(data2d, fs=1, radialsum=True)),
                               expectedsum, rtol=1e-9)
    np.testing.assert_allclose(power(periodogram(data2d, fs=1, radialavg=True)),
                               expectedmean, rtol=1e-9)
    full = power(periodogram(data2d, fs=1))
    np.testing.assert_allclose(full,
                               np.abs(np.fft.fft2(data2d)) ** 2 / data2d.size,
                               rtol=1e-9)
    # padded
    pads = (data2d.shape[0] + 4, data2d.shape[0] + 7)
    padded = np.zeros(pads)
    padded[: data2d.shape[0], : data2d.shape[1]] = data2d
    np.testing.assert_allclose(power(periodogram(data2d, fs=1, nfft=pads)),
                               np.abs(np.fft.fft2(padded)) ** 2 / data2d.size,
                               rtol=1e-9)
    # radial freq axis matches 1-D
    np.testing.assert_allclose(
        freq(periodogram(data2d, fs=3.3, radialsum=True)),
        freq(periodogram(data2d[0, :], fs=3.3)), atol=1e-12)


def test_fftshift_tfr():
    p = periodogram(DATA)
    ps = fftshift_tfr(p)
    np.testing.assert_array_equal(power(p), power(ps))
    p = periodogram(DATA, onesided=False)
    ps = fftshift_tfr(p)
    np.testing.assert_allclose(np.fft.fftshift(np.asarray(power(p))),
                               power(ps))
    np.testing.assert_allclose(np.fft.fftshift(freq(p)), freq(ps))


def test_welch_channels_extension():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1024, 3))
    p = power(welch_pgram(x, 128, 64, window=W.hanning, fs=1.0))
    assert p.shape == (65, 3)
    for c in range(3):
        np.testing.assert_allclose(
            np.asarray(p[:, c]),
            np.asarray(power(welch_pgram(x[:, c], 128, 64, window=W.hanning))),
            rtol=1e-10)
    # scipy cross-check
    from scipy.signal import welch as sp_welch
    f, pw = sp_welch(x[:, 0], fs=1.0, window=W.hanning(128), nperseg=128,
                     noverlap=64, detrend=False)
    np.testing.assert_allclose(np.asarray(p[:, 0]), pw, rtol=1e-8)


def test_errors():
    with pytest.raises(ValueError):
        periodogram(DATA + 1j, onesided=True)
    with pytest.raises(ValueError):
        periodogram(DATA, nfft=4)
    with pytest.raises(ValueError):
        periodogram(DATA, radialsum=True)
