"""Filter application: SOS/biquad cascades, stateful streaming filters,
zero-phase filtfilt, and FFT-based FIR filtering.

Capability parity with reference src/Filters/filt.jl (SOS cascade
:35-65, Biquad :70-92, DF2TFilter :122-230, filtfilt :245-360,
filt_stepstate :370-423, tdfilt/fftfilt :431-551). TPU-first redesign:

  * The IIR/biquad recurrence is a *parallel associative scan* over
    affine state updates z_t = M z_{t-1} + c x_t (M the 2x2 — or pxp
    companion — transition matrix). O(log n) depth on device instead of
    the reference's sequential per-sample loop (filt.jl:39-49), fully
    vectorized over trailing channel dims. Stable filters keep the
    cumulative transition products bounded, so accuracy in float64
    matches the sequential form to ~1 ulp per log2(n) levels.
  * filtfilt's odd-symmetric edge extrapolation is pure batched slicing
    (no per-column loops).
  * fftfilt reuses the batched overlap-save convolution (one rFFT over
    all segments) from ops.dspbase.
"""

import numpy as np
import jax.numpy as jnp
from jax import lax

from ..ops import dspbase
from ..ops.dspbase import _flatten_channels, _as_1d
from .coefficients import (FilterCoefficients, PolynomialRatio, Biquad,
                           SecondOrderSections, ZeroPoleGain, as_sos,
                           coefb, coefa)

__all__ = ["filt", "sosfilt", "DF2TFilter", "filtfilt", "fftfilt",
           "tdfilt", "filt_stepstate", "filt_stepstate_sos"]


# ---------------------------------------------------------------------------
# parallel affine linear recurrence
# ---------------------------------------------------------------------------

def _affine_scan(M, u, z0):
    """Solve z_t = M @ z_{t-1} + u_t, t = 1..n, as an associative scan.

    M: (p, p) static transition; u: (n, p, C); z0: (p, C).
    Returns z: (n, p, C) (z[t-1] == z_t).
    """
    n = u.shape[0]
    u = u.at[0].add(M @ z0)
    A = jnp.broadcast_to(M, (n,) + M.shape)

    def compose(left, right):
        A1, b1 = left
        A2, b2 = right
        return (jnp.einsum("...ij,...jk->...ik", A2, A1),
                jnp.einsum("...ij,...jc->...ic", A2, b1) + b2)

    _, z = lax.associative_scan(compose, (A, u))
    return z


def _biquad_apply(b0, b1, b2, a1, a2, x, z0):
    """One DF2T biquad over x (n, C) with state z0 (2, C); returns
    (y, z_final). State convention matches reference filt.jl:39-49."""
    dtype = x.dtype
    one = jnp.ones((), dtype)
    zero = jnp.zeros((), dtype)
    M = jnp.stack([jnp.stack([-a1, one]),
                   jnp.stack([-a2, zero])]).astype(dtype)
    c = jnp.stack([b1 - a1 * b0, b2 - a2 * b0]).astype(dtype)
    u = x[:, None, :] * c[:, None]
    z = _affine_scan(M, u, z0)
    z_prev1 = jnp.concatenate([z0[0][None], z[:-1, 0]], axis=0)
    y = b0 * x + z_prev1
    return y, z[-1]


def _iir_affine(b, a, x, z0):
    """General-order transposed DF-II via the companion-matrix affine
    scan. b, a padded to equal length sz+1 with a[0] == 1; x (n, C);
    z0 (sz, C). Returns (y, z_final)."""
    dtype = x.dtype
    sz = b.shape[0] - 1
    at = a[1:].astype(dtype)
    bt = b[1:].astype(dtype)
    b0 = b[0].astype(dtype)
    M = jnp.zeros((sz, sz), dtype)
    M = M.at[:, 0].set(-at)
    if sz > 1:
        M = M + jnp.eye(sz, k=1, dtype=dtype)
    c = bt - at * b0
    u = x[:, None, :] * c[:, None]
    z = _affine_scan(M, u, z0)
    z_prev1 = jnp.concatenate([z0[0][None], z[:-1, 0]], axis=0)
    y = b0 * x + z_prev1
    return y, z[-1]


# ---------------------------------------------------------------------------
# SOS filtering
# ---------------------------------------------------------------------------

def _sos_arrays(f):
    """Accept SecondOrderSections | Biquad | (nsec, 5) array; return
    ((nsec, 5) ndarray, gain)."""
    if isinstance(f, SecondOrderSections):
        return f.sos_array(), f.g
    if isinstance(f, Biquad):
        return np.array([[f.b0, f.b1, f.b2, f.a1, f.a2]]), 1.0
    arr = np.asarray(f, dtype=np.float64).reshape(-1, 5)
    return arr, 1.0


def _sosfilt(sos, g, x, si):
    """Cascade over sections (static count); x (n, *chans),
    si (2, nsec, *chans). Returns (y, si_final)."""
    flat, restore = _flatten_channels(x)
    dtype = flat.dtype
    if not (jnp.issubdtype(dtype, jnp.floating)
            or jnp.issubdtype(dtype, jnp.complexfloating)):
        dtype = jnp.result_type(dtype, jnp.float32)
    flat = flat.astype(dtype)
    nsec = sos.shape[0]
    si_flat = si.reshape(2, nsec, -1).astype(dtype)
    y = flat
    finals = []
    for k in range(nsec):
        b0, b1, b2, a1, a2 = (jnp.asarray(sos[k, j], dtype) for j in range(5))
        y, zf = _biquad_apply(b0, b1, b2, a1, a2, y, si_flat[:, k])
        finals.append(zf)
    y = y * jnp.asarray(g, dtype)
    si_final = jnp.stack(finals, axis=1).reshape((2, nsec) + x.shape[1:])
    return restore(y), si_final


def sosfilt(f, x, si=None):
    """Filter x along axis 0 through a biquad cascade (reference
    filt.jl:35-65). `f` is a SecondOrderSections, Biquad, or (nsec, 5)
    [b0 b1 b2 a1 a2] array. If `si` (shape (2, nsec, *chans)) is given,
    returns (y, si_final) for streaming continuation."""
    x = jnp.asarray(x)
    sos, g = _sos_arrays(f)
    nsec = sos.shape[0]
    if si is None:
        zi = jnp.zeros((2, nsec) + x.shape[1:], x.dtype)
        y, _ = _sosfilt(sos, g, x, zi)
        return y
    y, sf = _sosfilt(sos, g, x, jnp.asarray(si))
    return y, sf


# ---------------------------------------------------------------------------
# filt entry point (arrays, coefficient objects, stateful filters)
# ---------------------------------------------------------------------------

def filt(f, a=None, x=None, si=None):
    """Apply a filter along the first dimension of x.

    Forms (reference filt.jl:17-96, dspbase.jl:14-24):
      filt(b, a, x)            — IIR/FIR from coefficient vectors
      filt(b, x)               — FIR taps (auto direct/overlap-save)
      filt(coef_object, x)     — PolynomialRatio/Biquad/SOS/ZPK
      filt(df2t_filter, x)     — stateful streaming filter
    """
    if isinstance(f, DF2TFilter):
        return f(a if x is None else x)
    if isinstance(f, (Biquad, SecondOrderSections)):
        return sosfilt(f, a if x is None else x, si)
    if isinstance(f, ZeroPoleGain):
        return sosfilt(as_sos(f), a if x is None else x, si)
    if isinstance(f, PolynomialRatio):
        return dspbase.filt(coefb(f), coefa(f), a if x is None else x, si=si)
    return dspbase.filt(f, a, x, si=si)


class DF2TFilter:
    """Stateful direct-form-II-transposed filter (reference
    filt.jl:122-230). Chunked calls continue the filter state, giving
    bit-compatible results with filtering the concatenated input.

    The state is a pytree leaf (jnp array); `coldims` sizes the
    trailing channel dims of the inputs this filter will see.
    """

    def __init__(self, coef, coldims=(), si=None):
        if isinstance(coef, ZeroPoleGain):
            coef = as_sos(coef)
        self.coef = coef
        if isinstance(coef, PolynomialRatio):
            b, a = coefb(coef), coefa(coef)
            sz = max(len(b), len(a)) - 1
            shape = (sz,) + tuple(coldims)
        elif isinstance(coef, SecondOrderSections):
            shape = (2, len(coef.biquads)) + tuple(coldims)
        elif isinstance(coef, Biquad):
            shape = (2, 1) + tuple(coldims)
        else:
            raise TypeError(f"unsupported coefficient type {type(coef)}")
        if si is not None:
            si = jnp.asarray(si)
            if isinstance(coef, Biquad) and si.shape[:1] == (2,) and (
                    si.ndim == 1 or si.shape[1] != 1):
                si = si.reshape((2, 1) + si.shape[1:])
            if si.shape != shape:
                raise ValueError(
                    f"state shape {si.shape} does not match filter {shape}")
            self.state = si
        else:
            self.state = jnp.zeros(shape)

    def __call__(self, x):
        x = jnp.asarray(x)
        if isinstance(self.coef, PolynomialRatio):
            y, self.state = dspbase.filt(coefb(self.coef), coefa(self.coef),
                                         x, si=self.state)
            return y
        if isinstance(self.coef, Biquad):
            y, self.state = sosfilt(self.coef, x, si=self.state)
            return y
        y, self.state = sosfilt(self.coef, x, si=self.state)
        return y

    filt = __call__


# ---------------------------------------------------------------------------
# filtfilt
# ---------------------------------------------------------------------------

def filt_stepstate(b, a):
    """Initial DF2T state making the step response steady-state
    (reference filt.jl:370-398). Host-side float64 solve; returns
    (si, b_padded, a_padded) with a[0] normalized to 1."""
    b = np.atleast_1d(np.asarray(b, dtype=np.float64))
    a = np.atleast_1d(np.asarray(a, dtype=np.float64))
    scale = a[0]
    b = b / scale
    a = a / scale
    sz = max(len(b), len(a))
    if sz == 1:
        return np.zeros(0), b, a
    bp = np.zeros(sz)
    bp[: len(b)] = b
    ap = np.zeros(sz)
    ap[: len(a)] = a
    A = np.hstack([-ap[1:, None], np.vstack([np.eye(sz - 2),
                                             np.zeros((1, sz - 2))])])
    B = bp[1:] - ap[1:] * bp[0]
    si = np.linalg.solve(np.eye(sz - 1) - A, B) * scale
    return si, bp, ap


def filt_stepstate_sos(sos):
    """Per-biquad steady-state initial conditions, closed form
    (reference filt.jl:403-423). sos: (nsec, 5). Returns (2, nsec)."""
    sos = np.asarray(sos, dtype=np.float64).reshape(-1, 5)
    nsec = sos.shape[0]
    si = np.zeros((2, nsec))
    y = 1.0
    for i in range(nsec):
        b0, b1, b2, a1, a2 = sos[i]
        den = 1 + a1 + a2
        si[0, i] = (-(a1 + a2) * b0 + (b1 + b2)) / den * y
        si[1, i] = (a1 * b2 - a2 * (b0 + b1) + b2) / den * y
        y *= (b0 + b1 + b2) / den
    return si


def _extrapolate(x, pad):
    """Odd-symmetric edge extension, batched over channels (reference
    filt.jl:245-258). x (n, C) -> (n + 2*pad, C)."""
    if pad == 0:
        return x
    front = 2 * x[0] - x[pad:0:-1]
    back = 2 * x[-1] - x[-2: -pad - 2: -1]
    return jnp.concatenate([front, x, back], axis=0)


def filtfilt(f, a=None, x=None):
    """Zero-phase filtering: forward and reverse pass with steady-state
    initial conditions and odd-symmetric edge extrapolation (reference
    filt.jl:261-360). Forms: filtfilt(b, x), filtfilt(b, a, x),
    filtfilt(coef_object, x)."""
    if isinstance(f, PolynomialRatio):
        return filtfilt(coefb(f), coefa(f), a if x is None else x)
    if isinstance(f, (Biquad, ZeroPoleGain, SecondOrderSections)):
        return _filtfilt_sos(as_sos(f), a if x is None else x)
    if x is None:
        b, x = f, a
        return _filtfilt_fir(_as_1d(jnp.asarray(b), "b"), jnp.asarray(x))
    b = np.atleast_1d(np.asarray(f))
    a = np.atleast_1d(np.asarray(a))
    if len(a) == 1:
        return _filtfilt_fir(jnp.asarray(b / a[0]), jnp.asarray(x))
    return _iir_filtfilt(b, a, jnp.asarray(x))


def _filtfilt_fir(b, x):
    """FIR path: single pass with the autocorrelation of b (reference
    filt.jl:301-325)."""
    nb = b.shape[0]
    newb = dspbase.conv(b, jnp.flip(jnp.conj(b)))
    flat, restore = _flatten_channels(x)
    ext = _extrapolate(flat, nb - 1)
    y = dspbase.filt(newb, None, ext)
    return restore(y[2 * nb - 2:])


def _iir_filtfilt(b, a, x):
    pad = min(3 * (max(len(a), len(b)) - 1), x.shape[0] - 1)
    zi, bp, ap = filt_stepstate(b, a)
    flat, restore = _flatten_channels(x)
    dtype = jnp.result_type(flat.dtype, jnp.asarray(bp).dtype)
    flat = flat.astype(dtype)
    bj, aj = jnp.asarray(bp, dtype), jnp.asarray(ap, dtype)
    zij = jnp.asarray(zi, dtype)

    ext = _extrapolate(flat, pad)
    y1, _ = _iir_affine(bj, aj, ext, zij[:, None] * ext[0][None, :])
    y1r = y1[::-1]
    y2, _ = _iir_affine(bj, aj, y1r, zij[:, None] * y1r[0][None, :])
    y = y2[::-1]
    return restore(y[pad: pad + x.shape[0]] if pad else y)


def _filtfilt_sos(f, x):
    sos, g = _sos_arrays(f)
    nsec = sos.shape[0]
    x = jnp.asarray(x)
    pad = min(6 * nsec, x.shape[0] - 1)

    flat, restore = _flatten_channels(x)
    dtype = jnp.result_type(flat.dtype, jnp.float64)
    flat = flat.astype(dtype)
    zij = jnp.asarray(filt_stepstate_sos(sos), dtype)

    ext = _extrapolate(flat, pad)
    y1, _ = _sosfilt(sos, g, ext, zij[:, :, None] * ext[0][None, None, :])
    y1r = y1[::-1]
    y2, _ = _sosfilt(sos, g, y1r, zij[:, :, None] * y1r[0][None, None, :])
    y = y2[::-1]
    return restore(y[pad: pad + x.shape[0]] if pad else y)


# ---------------------------------------------------------------------------
# tdfilt / fftfilt
# ---------------------------------------------------------------------------

def tdfilt(h, x):
    """FIR filtering via the direct (MXU convolution) algorithm
    (reference filt.jl:431-443)."""
    return dspbase.filt(_as_1d(jnp.asarray(h), "h"), None, jnp.asarray(x))


def fftfilt(b, x, nfft=None):
    """FIR filtering via batched overlap-save FFTs along axis 0
    (reference filt.jl:453-521). One rFFT call covers every segment of
    every channel."""
    b = _as_1d(jnp.asarray(b), "b")
    x = jnp.asarray(x)
    y = dspbase._conv_os_1d(x, b, nfft=nfft)
    return y[: x.shape[0]]
