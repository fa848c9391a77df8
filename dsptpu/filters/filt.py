"""Filter application: SOS/biquad cascades, stateful streaming filters,
zero-phase filtfilt, and FFT-based FIR filtering.

Capability parity with reference src/Filters/filt.jl (SOS cascade
:35-65, Biquad :70-92, DF2TFilter :122-230, filtfilt :245-360,
filt_stepstate :370-423, tdfilt/fftfilt :431-551). TPU-first redesign:

  * The IIR/biquad recurrence z_t = M z_{t-1} + c x_t (M the 2x2 — or
    pxp companion — transition matrix) runs as a *blocked parallel
    linear recurrence*: M is constant and its coefficients are host
    design-time values, so all transition-power and lower-triangular
    Toeplitz-of-powers tables are precomputed in numpy float64 and the
    device work is one dense (S*p, S*p) matmul per block batch (MXU)
    plus an O(log(n/S))-depth associative scan over block boundary
    states only. This replaces the reference's sequential per-sample
    loop (filt.jl:39-49) and is fully vectorized over trailing channel
    dims. Stable filters keep the power tables bounded, so float64
    accuracy matches the sequential form to ~1 ulp per combine level.
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


def _affine_tables(bp_key, ap_key, S):
    """Host numpy float64 tables for the blocked recurrence of the
    companion transition M (p x p) of a normalized (a0 == 1) filter.

    Returns (c, M, T2, MS, P1) where c is the DF2T input-injection
    vector, T2 the (S*p, S*p) lower-triangular Toeplitz-of-powers
    matrix with T2[s*p+a, i*p+b] = (M^{s-i})[a, b] for i <= s, MS = M^S,
    and P1 = stacked powers M^1..M^S as (S, p, p)."""
    bp = np.asarray(bp_key, dtype=np.float64)
    ap = np.asarray(ap_key, dtype=np.float64)
    p = len(ap) - 1
    M = np.zeros((p, p))
    M[:, 0] = -ap[1:]
    if p > 1:
        M += np.eye(p, k=1)
    c = bp[1:] - ap[1:] * bp[0]
    powers = np.empty((S + 1, p, p))
    powers[0] = np.eye(p)
    for k in range(S):
        powers[k + 1] = M @ powers[k]
    diff = np.arange(S)[:, None] - np.arange(S)[None, :]
    T = np.where((diff >= 0)[:, :, None, None],
                 powers[np.clip(diff, 0, S)], 0.0)   # (S, S, p, p)
    T2 = T.transpose(0, 2, 1, 3).reshape(S * p, S * p)
    return c, M, T2, powers[S], powers[1: S + 1]


_affine_tables_cache = {}


def _affine_tables_cached(bp, ap, S):
    key = (tuple(np.asarray(bp, dtype=np.float64).tolist()),
           tuple(np.asarray(ap, dtype=np.float64).tolist()), S)
    hit = _affine_tables_cache.get(key)
    if hit is None:
        hit = _affine_tables(key[0], key[1], S)
        if len(_affine_tables_cache) > 256:
            _affine_tables_cache.clear()
        _affine_tables_cache[key] = hit
    return hit


_AFFINE_BLOCK = 128


def _affine_apply(bp, ap, x, z0):
    """Transposed DF-II of a normalized filter over x (n, C) with
    initial state z0 (p, C); returns (y, z_final).

    bp/ap are host numpy coefficient vectors (equal length p+1,
    a[0] == 1) — design-time constants per the architecture — so the
    blocked-recurrence tables are computed on host (no traced power
    chains for XLA to constant-fold). Device work per block batch: one
    (S*p, S*p) matmul for within-block prefix states, an associative
    scan over the n/S block boundary states, and a rank-1 reconstruct.
    Replaces the reference's sequential loop (dspbase.jl:69-92,
    Filters/filt.jl:39-49)."""
    dtype = x.dtype
    n, C = x.shape
    p = len(ap) - 1
    S = _AFFINE_BLOCK
    c, M, T2, MS, P1 = _affine_tables_cached(bp, ap, S)
    b0 = jnp.asarray(np.float64(bp[0])).astype(dtype)

    # channels ride the leading batch dim; the only big contraction is
    # a clean (C*B, S*p) @ (S*p, S*p) matmul, so the tiny p never lands
    # in the TPU lane axis
    xT = x.T                                             # (C, n)
    u = xT[:, :, None] * jnp.asarray(c).astype(dtype)    # (C, n, p)
    u = u.at[:, 0].add((jnp.asarray(M).astype(dtype) @ z0).T)

    B = -(-n // S)
    npad = B * S - n
    if npad:
        u = jnp.pad(u, ((0, 0), (0, npad), (0, 0)))
    U = u.reshape(C * B, S * p)
    W = jnp.dot(U, jnp.asarray(T2.T).astype(dtype),
                preferred_element_type=dtype,
                precision=lax.Precision.HIGHEST)         # (C*B, S*p)
    Wl = W.reshape(C, B, S, p)

    # cross-block boundary states: zs_{k+1} = M^S zs_k + W[k, -1]
    zin = jnp.zeros((1, p, C), dtype)
    if B > 1:
        v = jnp.moveaxis(Wl[:, :-1, -1], 0, -1)          # (B-1, p, C)
        zs = _affine_scan(jnp.asarray(MS).astype(dtype), v,
                          jnp.zeros((p, C), dtype))      # (B-1, p, C)
        zin = jnp.concatenate([zin, zs], axis=0)         # (B, p, C)

    # reconstruct z_{k,s} = M^{s+1} zin_k + W[k, s]
    z = jnp.einsum("sab,kbc->cksa", jnp.asarray(P1).astype(dtype),
                   zin, precision=lax.Precision.HIGHEST) + Wl
    zflat = z.reshape(C, B * S, p)[:, :n]

    z1 = zflat[:, :, 0]                                  # (C, n)
    z_prev1 = jnp.concatenate([z0[0][:, None], z1[:, :-1]], axis=1)
    y = (b0 * xT + z_prev1).T
    return y, zflat[:, -1].T


def _biquad_apply(b0, b1, b2, a1, a2, x, z0):
    """One DF2T biquad (reference filt.jl:39-49 state convention);
    coefficients are host scalars. x (n, C), z0 (2, C)."""
    return _affine_apply(np.array([b0, b1, b2]),
                         np.array([1.0, a1, a2]), x, z0)


def _companion_powers(ap, n):
    """Host powers M^0..M^n of the companion matrix (for cross-shard
    state chaining). Returns (n+1, p, p) numpy float64."""
    ap = np.asarray(ap, dtype=np.float64)
    p = len(ap) - 1
    M = np.zeros((p, p))
    M[:, 0] = -ap[1:]
    if p > 1:
        M += np.eye(p, k=1)
    out = np.empty((n + 1, p, p))
    out[0] = np.eye(p)
    for k in range(n):
        out[k + 1] = M @ out[k]
    return out



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
    sos_np = np.asarray(sos, dtype=np.float64)
    for k in range(nsec):
        y, zf = _biquad_apply(*sos_np[k], y, si_flat[:, k])
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
    dtype = jnp.result_type(flat.dtype, np.float64)
    flat = flat.astype(dtype)
    zij = jnp.asarray(zi, dtype)

    ext = _extrapolate(flat, pad)
    y1, _ = _affine_apply(bp, ap, ext, zij[:, None] * ext[0][None, :])
    y1r = y1[::-1]
    y2, _ = _affine_apply(bp, ap, y1r, zij[:, None] * y1r[0][None, :])
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
