import numpy as np
import jax.numpy as jnp
import pytest

from dsptpu.ops.dspbase import (filt, conv, deconv, xcorr, optimal_os_nfft,
                                _conv_os_1d)


def test_filt_fir_reference_vectors():
    b = [1., 2., 3., 4.]
    x = np.array([1., 1., 0., 1., 1., 0., 0., 0.])
    np.testing.assert_allclose(filt(b, 1., x),
                               [1., 3., 5., 8., 7., 5., 7., 4.], atol=1e-12)
    np.testing.assert_allclose(filt(b, 1., np.arange(1., 11.)),
                               [1., 4., 10., 20., 30., 40., 50., 60., 70., 80.],
                               atol=1e-12)
    np.testing.assert_allclose(filt(b, x),  # 2-arg FIR shorthand
                               [1., 3., 5., 8., 7., 5., 7., 4.], atol=1e-12)


def test_filt_iir_reference_vectors():
    b = [1., 2., 3., 4.]
    x = np.array([1., 1., 0., 1., 1., 0., 0., 0.])
    np.testing.assert_allclose(
        filt(b, [1., -0.5], x),
        [1., 3.5, 6.75, 11.375, 12.6875, 11.34375, 12.671875, 10.3359375],
        atol=1e-12)


def test_filt_multichannel_matches_per_column():
    b = [1., 2., 3., 4.]
    a = [1., -0.5]
    x = np.random.default_rng(0).normal(size=(50, 3))
    full = filt(b, a, x)
    for c in range(3):
        np.testing.assert_allclose(full[:, c], filt(b, a, x[:, c]), atol=1e-12)
    # FIR path too
    full = filt(b, 1., x)
    for c in range(3):
        np.testing.assert_allclose(full[:, c], filt(b, 1., x[:, c]), atol=1e-12)


def test_filt_initial_conditions_dc():
    # 5-pole butterworth with steady-state si: DC input passes unchanged
    b = [0.003279216306360201, 0.016396081531801006, 0.03279216306360201,
         0.03279216306360201, 0.016396081531801006, 0.003279216306360201]
    a = [1.0, -2.4744161749781606, 2.8110063119115782, -1.703772240915465,
         0.5444326948885326, -0.07231566910295834]
    si = np.array([0.9967207836936347, -1.4940914728163142, 1.2841226760316475,
                   -0.4524417279474106, 0.07559488540931815])
    y, zf = filt(b, a, np.ones(10), si=si)
    np.testing.assert_allclose(y, np.ones(10), rtol=1e-10)
    np.testing.assert_allclose(zf, si, rtol=1e-8)


def test_filt_state_continuation():
    # chunked filtering with state carry == one-shot
    rng = np.random.default_rng(1)
    b = rng.normal(size=5)
    a = np.array([1.0, -0.4, 0.2, 0.1, -0.05])
    x = rng.normal(size=100)
    whole = filt(b, a, x)
    si = np.zeros(4)
    parts = []
    for chunk in np.split(x, [30, 55, 80]):
        y, si = filt(b, a, chunk, si=si)
        parts.append(y)
    np.testing.assert_allclose(np.concatenate(parts), whole, atol=1e-12)


def test_conv_basic():
    a = [1, 2, 1, 2]
    b = [1, 2, 3]
    exp = np.array([1, 4, 8, 10, 7, 6])
    np.testing.assert_allclose(conv(np.float64(a) * 1.0, np.float64(b) * 1.0), exp)
    np.testing.assert_array_equal(np.asarray(conv(a, b)), exp)
    fa = np.array(a, dtype=np.float64)
    fb = np.array(b, dtype=np.float64)
    im_exp = np.array([1, 3, 6, 6, 5, 3], dtype=np.float64)
    got = conv(fa + 1j, fb + 0j)
    np.testing.assert_allclose(np.real(got), exp, atol=1e-12)
    np.testing.assert_allclose(np.imag(got), im_exp, atol=1e-12)


@pytest.mark.parametrize("m,n", [(10, 10), (10, 200), (200, 10), (190, 200)])
@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_conv_algorithms_agree(m, n, dtype):
    rng = np.random.default_rng(42)
    u = rng.normal(size=m).astype(dtype)
    v = rng.normal(size=n).astype(dtype)
    if np.issubdtype(dtype, np.complexfloating):
        u = u + 1j * rng.normal(size=m)
        v = v + 1j * rng.normal(size=n)
    ref = np.convolve(u, v)
    for alg in ["direct", "fft_simple", "fft_overlapsave", "fft", "fast", "auto"]:
        np.testing.assert_allclose(conv(u, v, algorithm=alg), ref, rtol=1e-9,
                                   atol=1e-9, err_msg=alg)


def test_conv_bad_algorithm():
    with pytest.raises(ValueError):
        conv(np.ones(4), np.ones(3), algorithm="quantum")


def test_conv_2d():
    rng = np.random.default_rng(3)
    A = rng.normal(size=(13, 17))
    B = rng.normal(size=(5, 3))
    from scipy.signal import convolve2d
    ref = convolve2d(A, B, mode="full")
    np.testing.assert_allclose(conv(A, B, algorithm="direct"), ref, atol=1e-10)
    np.testing.assert_allclose(conv(A, B, algorithm="fft_simple"), ref, atol=1e-10)
    # separable form conv(u, v, A)
    u = rng.normal(size=4)
    v = rng.normal(size=6)
    ref2 = convolve2d(np.outer(u, v), A, mode="full")
    np.testing.assert_allclose(conv(u, v, A), ref2, atol=1e-10)


def test_conv_3d():
    rng = np.random.default_rng(4)
    A = rng.normal(size=(6, 5, 4))
    B = rng.normal(size=(3, 2, 2))
    from scipy.signal import fftconvolve
    ref = fftconvolve(A, B, mode="full")
    np.testing.assert_allclose(conv(A, B), ref, atol=1e-10)
    np.testing.assert_allclose(conv(A, B, algorithm="direct"), ref, atol=1e-10)


def test_conv_large_int_exact():
    n = 314159265
    out = conv(np.array([n], dtype=np.int64), np.array([n], dtype=np.int64))
    assert int(out[0]) == n ** 2


def test_os_nfft_sane():
    assert optimal_os_nfft(1_000_000, 4097) >= 8192
    assert optimal_os_nfft(100, 3) >= 8


def test_deconv():
    b = np.array([4., 2., 1., 3.])
    a = np.array([2., 1.])
    c = deconv(conv(b, a), a)
    np.testing.assert_allclose(c, b, atol=1e-10)
    # shorter numerator
    np.testing.assert_allclose(deconv(np.ones(2), np.ones(4)), [0.0])


def test_xcorr():
    got = xcorr(np.array([1., 2., 3.]), np.array([1., 2., 3.]))
    np.testing.assert_allclose(got, [3., 8., 14., 8., 3.], atol=1e-10)
    # padmode longest centers zero lag
    u = np.array([1., 2., 3.])
    v = np.array([1., 2., 3., 4., 5.])
    res = xcorr(u, v, padmode="longest")
    assert res.shape[0] == 2 * 5 - 1
    ref = np.correlate(np.pad(u, (0, 2)), v, mode="full")
    np.testing.assert_allclose(res, ref, atol=1e-10)
    # biased scaling
    res = xcorr(np.array([1., 2., 3.]), scaling="biased")
    np.testing.assert_allclose(res, np.array([3., 8., 14., 8., 3.]) / 3, atol=1e-12)
    with pytest.raises(ValueError):
        xcorr(u, v, scaling="biased")
    with pytest.raises(ValueError):
        xcorr(u, v, padmode="bogus")
    # conjugation convention: matches scipy.signal.correlate(u, v)
    uc = np.array([1 + 2j, 2 - 1j, 3 + 0j])
    vc = np.array([2 - 3j, 0 + 1j])
    from scipy.signal import correlate
    np.testing.assert_allclose(xcorr(uc, vc), correlate(uc, vc, mode="full"),
                               atol=1e-10)


def test_jit_compatible():
    import jax
    b = jnp.asarray([1., 2., 3., 4.])
    x = jnp.asarray(np.random.default_rng(0).normal(size=256))
    f = jax.jit(lambda xx: filt(b, jnp.asarray([1., -0.5]), xx))
    np.testing.assert_allclose(f(x), filt(b, [1., -0.5], x), atol=1e-12)
    g = jax.jit(lambda u, v: conv(u, v, algorithm="fft_overlapsave"))
    u = jnp.asarray(np.random.default_rng(1).normal(size=1000))
    v = jnp.asarray(np.random.default_rng(2).normal(size=100))
    np.testing.assert_allclose(g(u, v), np.convolve(u, v), rtol=1e-9, atol=1e-9)


class TestMxFFT:
    """Four-step matmul FFT (ops/mxfft.py) against numpy."""

    rng = np.random.default_rng(42)

    @pytest.mark.parametrize("n", [8192, 32768])
    def test_fft_ifft(self, n):
        from dsptpu.ops import mxfft
        assert mxfft.mx_supported(n)
        x = (self.rng.standard_normal(n)
             + 1j * self.rng.standard_normal(n)).astype(np.complex64)
        got = np.asarray(mxfft.fft(jnp.asarray(x)))
        ref = np.fft.fft(x)
        assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 1e-5
        back = np.asarray(mxfft.ifft(jnp.asarray(got)))
        assert np.max(np.abs(back - x)) < 1e-4

    def test_rfft_irfft_batched(self):
        from dsptpu.ops import mxfft
        x = self.rng.standard_normal((3, 16384)).astype(np.float32)
        got = np.asarray(mxfft.rfft(jnp.asarray(x), axis=-1))
        ref = np.fft.rfft(x, axis=-1)
        assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 1e-5
        y = np.asarray(mxfft.irfft(jnp.asarray(got), n=16384, axis=-1))
        assert np.max(np.abs(y - x)) < 1e-4

    def test_unsupported_falls_back(self):
        from dsptpu.ops import mxfft
        x = self.rng.standard_normal(1000)
        np.testing.assert_allclose(np.asarray(mxfft.fft(jnp.asarray(x))),
                                   np.fft.fft(x), rtol=1e-9, atol=1e-9)


class TestMxfftTiles:
    def test_tiles_roundtrip_and_order(self):
        from dsptpu.ops import mxfft
        rng = np.random.default_rng(9)
        x = (rng.standard_normal((3, 16384))
             + 1j * rng.standard_normal((3, 16384))).astype(np.complex64)
        Xt = mxfft.fft_tiles(jnp.asarray(x), 16384)
        l1 = Xt.shape[-2]
        # tile (k1, k2) flattens to bins k = k1 + l1*k2
        want = np.fft.fft(x, axis=-1)
        got = np.asarray(Xt).swapaxes(-2, -1).reshape(3, -1)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-2)
        back = np.asarray(mxfft.ifft_tiles(Xt, 16384))
        np.testing.assert_allclose(back, x, rtol=2e-4, atol=2e-4)

    def test_paired_real_conv_matches_direct(self):
        rng = np.random.default_rng(10)
        x = rng.standard_normal((60000, 3)).astype(np.float32)
        h = rng.standard_normal(3000).astype(np.float32)
        got = np.asarray(_conv_os_1d(jnp.asarray(x), jnp.asarray(h),
                                     nfft=16384))
        want = np.stack([np.convolve(x[:, c].astype(np.float64),
                                     h.astype(np.float64))
                         for c in range(3)], axis=-1)
        err = np.max(np.abs(got - want)) / np.max(np.abs(want))
        assert err < 5e-6

    def test_paired_complex_conv(self):
        rng = np.random.default_rng(11)
        x = (rng.standard_normal(40000)
             + 1j * rng.standard_normal(40000)).astype(np.complex64)
        h = (rng.standard_normal(2000)
             + 1j * rng.standard_normal(2000)).astype(np.complex64)
        got = np.asarray(_conv_os_1d(jnp.asarray(x), jnp.asarray(h),
                                     nfft=8192))
        want = np.convolve(x.astype(np.complex128),
                           h.astype(np.complex128))
        err = np.max(np.abs(got - want)) / np.max(np.abs(want))
        assert err < 5e-6


def test_conv_2d_blocked_overlap_save():
    """Shapes large enough that _conv_os_nd genuinely blocks dimensions
    (the round-2 suite only hit the direct/fft_simple fallbacks)."""
    from dsptpu.ops.dspbase import optimal_os_nfft, _conv_os_nd
    rng = np.random.default_rng(7)
    A = rng.normal(size=(2048, 257)).astype(np.float64)
    B = rng.normal(size=(15, 15))
    # sanity: the cost model actually chooses to block dim 0
    assert optimal_os_nfft(2048, 15) < 1 << (2048 + 15 - 2).bit_length()
    from scipy.signal import fftconvolve
    ref = fftconvolve(A, B, mode="full")
    got = np.asarray(conv(A, B, algorithm="fft_overlapsave"))
    np.testing.assert_allclose(got, ref, rtol=1e-8, atol=1e-8)
    # and the auto path agrees
    np.testing.assert_allclose(np.asarray(conv(A, B)), ref,
                               rtol=1e-8, atol=1e-8)


def test_conv_2d_blocked_both_dims():
    from scipy.signal import fftconvolve
    rng = np.random.default_rng(8)
    A = rng.normal(size=(700, 900))
    B = rng.normal(size=(11, 9))
    ref = fftconvolve(A, B, mode="full")
    got = np.asarray(conv(A, B, algorithm="fft_overlapsave"))
    np.testing.assert_allclose(got, ref, rtol=1e-8, atol=1e-8)


def test_conv_2d_blocked_complex():
    from scipy.signal import fftconvolve
    rng = np.random.default_rng(9)
    A = (rng.normal(size=(1024, 130))
         + 1j * rng.normal(size=(1024, 130)))
    B = rng.normal(size=(9, 5)) + 1j * rng.normal(size=(9, 5))
    ref = fftconvolve(A, B, mode="full")
    got = np.asarray(conv(A, B, algorithm="fft_overlapsave"))
    np.testing.assert_allclose(got, ref, rtol=1e-8, atol=1e-8)


def test_conv_3d_blocked():
    from scipy.signal import fftconvolve
    rng = np.random.default_rng(10)
    A = rng.normal(size=(512, 40, 30))
    B = rng.normal(size=(7, 5, 3))
    ref = fftconvolve(A, B, mode="full")
    got = np.asarray(conv(A, B, algorithm="fft_overlapsave"))
    np.testing.assert_allclose(got, ref, rtol=1e-8, atol=1e-8)


def test_conv_with_offset():
    """Offset-axes conv analogue (reference ext/OffsetArraysExt.jl:5 +
    dspbase.jl:663-672): out offset = sum of input offsets per axis;
    values are the plain full convolution."""
    from dsptpu import conv_with_offset
    rng = np.random.default_rng(5)
    u = rng.standard_normal(20)
    v = rng.standard_normal(7)
    out, off = conv_with_offset(u, v, u_offsets=-3, v_offsets=10)
    assert off == (7,)
    np.testing.assert_allclose(np.asarray(out),
                               np.convolve(u, v), atol=1e-12)
    # 2-D with per-axis offsets, defaults to 0
    A = rng.standard_normal((6, 5))
    B = rng.standard_normal((3, 4))
    out2, off2 = conv_with_offset(A, B, u_offsets=(1, -2))
    assert off2 == (1, -2)
    from scipy.signal import fftconvolve
    np.testing.assert_allclose(np.asarray(out2),
                               fftconvolve(A, B, mode="full"), atol=1e-10)
    with pytest.raises(ValueError):
        conv_with_offset(A, B, u_offsets=(1, 2, 3))
