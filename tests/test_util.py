import numpy as np
import pytest

from dsptpu.utils.util import (hilbert, db2pow, db2amp, pow2db, amp2db, rms,
                               rmsfft, meanfreq, finddelay, shiftsignal,
                               alignsignals, shiftin)
from dsptpu.utils.fftutil import nextfastfft, nextpow2
from dsptpu.utils.diric import diric
from dsptpu.utils.unwrap import unwrap


def test_hilbert_analytic_signal():
    # analytic signal of cos is cos + j sin
    t = np.arange(256) / 256
    x = np.cos(2 * np.pi * 8 * t)  # exactly periodic
    xa = np.asarray(hilbert(x))
    np.testing.assert_allclose(np.real(xa), x, atol=1e-10)
    np.testing.assert_allclose(np.imag(xa), np.sin(2 * np.pi * 8 * t), atol=1e-10)
    # against scipy for exactness
    from scipy.signal import hilbert as sp_hilbert
    rng = np.random.default_rng(0)
    for n in (64, 65):
        x = rng.normal(size=n)
        np.testing.assert_allclose(np.asarray(hilbert(x)), sp_hilbert(x),
                                   atol=1e-10)
    # columns
    X = rng.normal(size=(64, 3))
    H = np.asarray(hilbert(X))
    for c in range(3):
        np.testing.assert_allclose(H[:, c], sp_hilbert(X[:, c]), atol=1e-10)
    with pytest.raises(ValueError):
        hilbert(np.ones(4) + 1j)


def test_db_conversions():
    assert np.isclose(db2pow(3.0), 10 ** 0.3)
    assert np.isclose(db2amp(3.0), 10 ** 0.15)
    assert np.isclose(pow2db(100.0), 20.0)
    assert np.isclose(amp2db(100.0), 40.0)
    assert np.isclose(db2pow(pow2db(7.3)), 7.3)
    assert np.isclose(db2amp(amp2db(7.3)), 7.3)


def test_rms_and_rmsfft():
    x = np.array([1.0, -1.0, 1.0, -1.0])
    assert np.isclose(float(rms(x)), 1.0)
    X = np.arange(12.0).reshape(3, 4)
    r = np.asarray(rms(X, dims=0))
    np.testing.assert_allclose(r, np.sqrt(np.mean(X ** 2, axis=0, keepdims=True)))
    f = np.fft.fft(x)
    assert np.isclose(float(rmsfft(f)), float(rms(x)))


def test_meanfreq():
    fs = 100.0
    t = np.arange(0, 10, 1 / fs)
    x = np.sin(2 * np.pi * 10 * t)
    assert abs(float(meanfreq(x, fs)) - 10.0) < 0.5


def test_nextfastfft():
    assert nextfastfft(97) == 98  # 2*7^2
    assert nextfastfft(64) == 64
    assert nextfastfft(1) == 1
    assert nextpow2(1000) == 1024


def test_shiftin():
    out = np.asarray(shiftin(np.array([1, 2, 3, 4]), np.array([5, 6])))
    np.testing.assert_array_equal(out, [3, 4, 5, 6])
    out = np.asarray(shiftin(np.array([1, 2]), np.array([3, 4, 5])))
    np.testing.assert_array_equal(out, [4, 5])


def test_finddelay_shiftsignal_alignsignals():
    assert finddelay(np.array([0, 0, 1, 2, 3.]), np.array([1, 2, 3.])) == 2
    assert finddelay(np.array([1, 2, 3.]), np.array([0, 0, 1, 2, 3.])) == -2
    np.testing.assert_array_equal(np.asarray(shiftsignal(np.array([1, 2, 3]), 2)),
                                  [0, 0, 1])
    np.testing.assert_array_equal(np.asarray(shiftsignal(np.array([1, 2, 3]), -2)),
                                  [3, 0, 0])
    with pytest.raises(ValueError):
        shiftsignal(np.array([1, 2, 3]), 4)
    x, d = alignsignals(np.array([0, 0, 1, 2, 3.]), np.array([1, 2, 3.]))
    assert d == 2
    np.testing.assert_array_equal(np.asarray(x), [1, 2, 3, 0, 0])


def test_diric():
    vals = np.asarray(diric(np.arange(-2, 2.01, 0.5) * np.pi, 5))
    np.testing.assert_allclose(
        vals, [1.0, -0.2, 0.2, -0.2, 1.0, -0.2, 0.2, -0.2, 1.0], atol=1e-9)
    assert np.isclose(float(diric(0.0, 4)), 1.0)
    # even n: diric(2pi, 4) == -1
    assert np.isclose(float(diric(2 * np.pi, 4)), -1.0)
    with pytest.raises(ValueError):
        diric(0.0, 0)


def test_unwrap_1d():
    true = np.linspace(0, 4 * np.pi, 100)
    wrapped = np.angle(np.exp(1j * true))
    got = np.asarray(unwrap(wrapped))
    np.testing.assert_allclose(got, true, atol=1e-9)
    # custom range
    r = 10.0
    true2 = np.linspace(0, 37.0, 50)
    wrapped2 = true2 % r
    wrapped2 = np.where(wrapped2 > r / 2, wrapped2 - r, wrapped2)
    got2 = np.asarray(unwrap(wrapped2, range=r))
    np.testing.assert_allclose(np.diff(got2), np.diff(true2), atol=1e-9)


def test_unwrap_along_dim():
    true = np.linspace(0, 4 * np.pi, 80)[:, None] + np.array([0.0, 1.0])[None, :]
    wrapped = np.angle(np.exp(1j * true))
    got = np.asarray(unwrap(wrapped, dims=0))
    np.testing.assert_allclose(np.diff(got, axis=0), np.diff(true, axis=0),
                               atol=1e-9)


def test_unwrap_nd():
    yy, xx = np.meshgrid(np.linspace(0, 6 * np.pi, 40),
                         np.linspace(0, 5 * np.pi, 35), indexing="ij")
    true = yy + 0.7 * xx
    wrapped = np.angle(np.exp(1j * true))
    got = unwrap(wrapped, dims=range(2))
    # result equals truth up to a global multiple of 2pi
    delta = got - true
    k = np.round(np.mean(delta) / (2 * np.pi))
    np.testing.assert_allclose(got - 2 * np.pi * k, true, atol=1e-7)


def test_unwrap_nd_circular():
    n = 32
    theta = 2 * np.pi * np.arange(n) / n  # exactly periodic along axis 0
    true = 3.0 * np.sin(theta)[:, None] + np.linspace(0, 4 * np.pi, 20)[None, :]
    wrapped = np.angle(np.exp(1j * true))
    got = unwrap(wrapped, dims=range(2), circular_dims=(True, False))
    delta = got - true
    k = np.round(np.mean(delta) / (2 * np.pi))
    np.testing.assert_allclose(got - 2 * np.pi * k, true, atol=1e-7)


def test_unwrap_validation():
    with pytest.raises(ValueError):
        unwrap(np.zeros((3, 3)))
    with pytest.raises(ValueError):
        unwrap(np.zeros((3, 3, 3)), dims=(0, 1))


class TestFFTPromotion:
    """One promotion policy for every FFT path (reference
    util.jl:92-104)."""

    def test_policy(self):
        import jax.numpy as jnp
        from dsptpu.utils.fftutil import fftintype, fftouttype, fftabs2type
        assert fftintype(jnp.int32) == jnp.float32
        assert fftintype(jnp.float16) == jnp.float32
        assert fftintype(jnp.float32) == jnp.float32
        assert fftintype(jnp.complex64) == jnp.complex64
        assert fftouttype(jnp.int32) == jnp.complex64
        assert fftouttype(jnp.float32) == jnp.complex64
        assert fftabs2type(jnp.int16) == jnp.float32
        assert fftabs2type(jnp.complex64) == jnp.float32

    def test_int_inputs_promote(self):
        import jax.numpy as jnp
        import dsptpu
        x = jnp.arange(64, dtype=jnp.int32)
        p = dsptpu.periodogram(x)
        assert jnp.issubdtype(p.power.dtype, jnp.floating)
        h = dsptpu.utils.util.hilbert(x)
        assert jnp.issubdtype(h.dtype, jnp.complexfloating)
        y = dsptpu.conv(x, jnp.arange(5, dtype=jnp.int32),
                        algorithm="fft_simple")
        assert jnp.issubdtype(y.dtype, jnp.floating)
        w = dsptpu.welch_pgram(x, 32, 16)
        assert jnp.issubdtype(w.power.dtype, jnp.floating)
