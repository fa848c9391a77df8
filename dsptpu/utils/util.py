"""Signal utilities (capability parity with reference src/util.jl).

Device ops (hilbert, rms, meanfreq, delay/alignment) are JAX and
jit-compatible; scalar dB helpers work on both numpy and JAX values.
The reference's `unsafe_dot`/`shiftin!` streaming kernels have no
direct analogue here: the polyphase streaming engine
(dsptpu/filters/stream.py) reformulates those dots as batched matmuls.
"""

import numpy as np
import jax
import jax.numpy as jnp

from .fftutil import nextfastfft, nextpow2, fftintype

__all__ = [
    "hilbert", "db2pow", "db2amp", "pow2db", "amp2db", "dB", "dBa",
    "rms", "rmsfft",
    "meanfreq", "shiftin", "finddelay", "shiftsignal", "alignsignals",
    "unsafe_dot",
]


def unsafe_dot(a, *args):
    """Windowed dot products of the reference streaming engine
    (util.jl:222-283), provided for API parity — the TPU streaming
    path never calls per-output dots; it lowers whole blocks of them
    to one banded matmul (filters.stream_filt._block_matmul).

    Forms (indices 0-based; `last` is the index of the LAST element
    of the window, inclusive):
      unsafe_dot(a, b, last)          -> dot(a, b[last-len(a)+1 : last+1])
      unsafe_dot(A, col, b, last)     -> same with a = A[:, col]
      unsafe_dot(a, b, c, k)          -> dot(a, concat(b[k-1:], c[:k]))
                                         (history b of len(a)-1 + new c)
    """
    a = jnp.asarray(a)
    if a.ndim == 2:
        col = args[0]
        a = a[:, col]
        args = args[1:]
    n = a.shape[0]
    if len(args) == 2:
        b, last = jnp.asarray(args[0]), int(args[1])
        return jnp.dot(a, jax.lax.dynamic_slice_in_dim(
            b, last - n + 1, n), precision=jax.lax.Precision.HIGHEST)
    b, c, k = jnp.asarray(args[0]), jnp.asarray(args[1]), int(args[2])
    if b.shape[0] != n - 1:
        raise ValueError("len(b) must equal len(a) - 1")
    if not 1 <= k < n:
        raise ValueError("k must be in [1, len(a))")
    seg = jnp.concatenate([b[k - 1:], c[:k]])
    return jnp.dot(a, seg, precision=jax.lax.Precision.HIGHEST)


class _DBconvert:
    """`3 * dB == db2pow(3)` (reference util.jl:141-146)."""
    def __rmul__(self, a):
        return db2pow(a)


class _DBaconvert:
    """`3 * dBa == db2amp(3)` (reference util.jl:141-146)."""
    def __rmul__(self, a):
        return db2amp(a)


dB = _DBconvert()
dBa = _DBaconvert()


def hilbert(x):
    """Analytic representation x_a = x + j*hilbert(x) along axis 0
    (reference src/util.jl:31-87): rfft, double the strictly-positive
    frequency bins, zero the negative half, inverse fft."""
    x = jnp.asarray(x)
    if jnp.iscomplexobj(x):
        raise ValueError("hilbert requires a real signal")
    if x.dtype != fftintype(x.dtype):
        x = x.astype(fftintype(x.dtype))
    n = x.shape[0]
    Xh = jnp.fft.rfft(x, axis=0)
    # bins 1 .. ceil(n/2)-1 are doubled; for even n the Nyquist bin
    # (index n//2) keeps weight 1, DC keeps weight 1.
    nhalf = Xh.shape[0]
    w = jnp.ones((nhalf,) + (1,) * (x.ndim - 1), Xh.real.dtype)
    hi = (n + 1) // 2  # first index NOT doubled (Nyquist for even n)
    w = w.at[1:hi].set(2.0)
    Xfull = jnp.zeros((n,) + x.shape[1:], Xh.dtype).at[:nhalf].set(Xh * w)
    return jnp.fft.ifft(Xfull, axis=0)


def db2pow(a):
    """dB -> power ratio (reference src/util.jl:154)."""
    return 10.0 ** (np.asarray(a) / 10.0) if not isinstance(a, jnp.ndarray) \
        else 10.0 ** (a / 10.0)


def db2amp(a):
    """dB -> amplitude ratio (reference src/util.jl:162)."""
    return 10.0 ** (np.asarray(a) / 20.0) if not isinstance(a, jnp.ndarray) \
        else 10.0 ** (a / 20.0)


def pow2db(a):
    """power ratio -> dB (reference src/util.jl:170)."""
    return 10.0 * (jnp.log10(a) if isinstance(a, jnp.ndarray) else np.log10(a))


def amp2db(a):
    """amplitude ratio -> dB (reference src/util.jl:178)."""
    return 20.0 * (jnp.log10(a) if isinstance(a, jnp.ndarray) else np.log10(a))


def rms(s, dims=None):
    """Root mean square, optionally along `dims` (reference src/util.jl:186-192)."""
    s = jnp.asarray(s)
    sq = jnp.abs(s) ** 2
    if dims is None:
        return jnp.sqrt(jnp.mean(sq))
    return jnp.sqrt(jnp.mean(sq, axis=dims, keepdims=True))


def rmsfft(f):
    """rms of the signal whose fft is `f` (reference src/util.jl:200)."""
    f = jnp.asarray(f)
    return jnp.sqrt(jnp.sum(jnp.abs(f) ** 2)) / f.size


def meanfreq(x, fs=2 * np.pi):
    """Mean power frequency (reference src/util.jl:211-220)."""
    x = jnp.asarray(x)
    pxx = jnp.abs(jnp.fft.rfft(x)) ** 2
    n = x.shape[0]
    freqs = fs / n * jnp.arange(n // 2 + 1)
    return jnp.sum(pxx * freqs) / jnp.sum(pxx)


def shiftin(a, b):
    """Functional analogue of the reference's `shiftin!`
    (src/util.jl:299-314): shift b into the end of a, returning an array
    of a's length holding the most recent samples."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    return jnp.concatenate([a, b], axis=0)[-a.shape[0]:]


def finddelay(x, y):
    """Delay of x w.r.t. y via the xcorr peak (reference src/util.jl:336-347).
    Ties resolve to the lag closest to zero."""
    from ..ops.dspbase import xcorr

    x = jnp.asarray(x)
    y = jnp.asarray(y)
    s = jnp.abs(xcorr(y, x, padmode="none"))
    center = x.shape[0]  # 1-based center index
    max_corr = jnp.max(s)
    idx = jnp.arange(1, s.shape[0] + 1)
    dist = jnp.where(s == max_corr, jnp.abs(center - idx), jnp.iinfo(jnp.int32).max)
    best = idx[jnp.argmin(dist)]
    d = center - best
    if isinstance(d, jax.core.Tracer):
        return d               # under jit: device scalar (jittable path)
    return int(d)              # concrete: plain Python int (reference API)


def shiftsignal(x, s):
    """Shift x by s samples, zero-filling (reference src/util.jl:357-395).
    Accepts a traced shift (roll + mask) so alignsignals is jittable."""
    x = jnp.asarray(x)
    n = x.shape[0]
    if isinstance(s, jax.core.Tracer):
        i = jnp.arange(n).reshape((n,) + (1,) * (x.ndim - 1))
        rolled = jnp.roll(x, s, axis=0)
        keep = jnp.where(s >= 0, i >= s, i < n + s)
        return jnp.where(keep, rolled, 0)
    if abs(s) > n:
        raise ValueError("|s| must not be greater than the length of x")
    if s == 0:
        return x
    if s > 0:
        return jnp.concatenate([jnp.zeros((s,) + x.shape[1:], x.dtype), x[: n - s]])
    return jnp.concatenate([x[-s:], jnp.zeros((-s,) + x.shape[1:], x.dtype)])


def alignsignals(x, y):
    """Align x to y; returns (aligned_x, delay) (reference src/util.jl:404-427)."""
    d = finddelay(x, y)
    return shiftsignal(x, -d), d
