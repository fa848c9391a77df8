"""Matmul (MXU) FFT for large power-of-two sizes.

XLA's TPU FFT underperforms both rooflines for the long transforms the
overlap-save convolution path needs (measured ~2.6 G-point/s on v5e at
nfft = 16384, ~1% of HBM roofline end to end). For those sizes this
module runs the classic four-step Cooley-Tukey factorization n = L1*L2
as two dense complex einsums — (B*L1, L2) @ (L2, L2) shapes the MXU
tiles perfectly — plus a twiddle multiply and one transpose:

    x[j2 + L2*j1]  --W_L1 over j1-->  * T[k1, j2]  --W_L2 over j2-->
    X[k1 + L1*k2]

Used by dspbase._conv_os_1d (and anything else) through fft/ifft/
rfft/irfft with a size gate; other sizes fall through to jnp.fft.
Accuracy: float32 matmuls at Precision.HIGHEST give ~1e-6 relative
error like a float32 FFT.

Reference role: FFTW replacement for the conv hot path
(dspbase.jl:583-606); the design is TPU-first, not a port.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["fft", "ifft", "rfft", "irfft", "fft_tiles", "ifft_tiles",
           "mx_supported"]

# MXU passes per f32 matmul: HIGHEST (6-pass, ~1e-6 rel error) by
# default; set to lax.Precision.HIGH (3-pass) to halve MXU work where
# ~1e-5 suffices
PRECISION = lax.Precision.HIGHEST

# four-step pays off where the XLA FFT falls off a cliff; below this
# size the native FFT wins (measured v5e crossover)
_MIN_N = 8192
_MAX_FACTOR = 512


def _split(n):
    """n = L1 * L2 with both factors pow2 and as square as possible."""
    l1 = 1 << ((n.bit_length() - 1) // 2)
    return l1, n // l1


def mx_supported(n):
    if n < _MIN_N or n & (n - 1):
        return False
    l1, l2 = _split(n)
    return l1 <= _MAX_FACTOR and l2 <= _MAX_FACTOR


_tab_cache = {}


def _tables(n):
    hit = _tab_cache.get(n)
    if hit is None:
        l1, l2 = _split(n)
        w1 = np.exp(-2j * np.pi * np.outer(np.arange(l1), np.arange(l1))
                    / l1).astype(np.complex64)
        w2 = np.exp(-2j * np.pi * np.outer(np.arange(l2), np.arange(l2))
                    / l2).astype(np.complex64)
        tw = np.exp(-2j * np.pi * np.outer(np.arange(l1), np.arange(l2))
                    / n).astype(np.complex64)
        hit = (l1, l2, w1, w2, tw)
        if len(_tab_cache) > 64:
            _tab_cache.clear()
        _tab_cache[n] = hit
    return hit


def _pack_tw(n):
    """Untwist table exp(-2*pi*i*k/n), k = 0..n/2-1 (float64 host
    build, complex64 on device)."""
    key = ("pk", n)
    hit = _tab_cache.get(key)
    if hit is None:
        hit = np.exp(-2j * np.pi * np.arange(n // 2) / n).astype(
            np.complex64)
        _tab_cache[key] = hit
    return hit


def fft(x, n=None, axis=-1):
    """Complex FFT along `axis` via the four-step matmul factorization
    (falls back to jnp.fft.fft when unsupported). The four-step body is
    jitted: some backends cannot run complex einsums eagerly."""
    x = jnp.asarray(x)
    ln = x.shape[axis] if n is None else int(n)
    if not mx_supported(ln):
        return jnp.fft.fft(x, n=n, axis=axis)
    return _fft_jit(x, ln, axis)


def _tiles_core(x, ln):
    """Four-step complex DFT over the LAST axis, output left in the
    (k1, k2) TILE DOMAIN: returns (..., l1, l2) where bin
    k = k1 + l1*k2. Skipping the bin-order transpose matters for
    transform-domain pointwise work (convolution): any fixed bin
    permutation is fine as long as both operands share it."""
    l1, l2, w1, w2, tw = _tables(ln)
    lead = x.shape[:-1]
    v = x.reshape(lead + (l1, l2))
    # stage 1: DFT over j1 (contraction with W_L1)
    v = jnp.einsum("...ij,ki->...kj", v, jnp.asarray(w1),
                   precision=PRECISION)
    # twiddle
    v = v * jnp.asarray(tw)
    # stage 2: DFT over j2
    v = jnp.einsum("...kj,lj->...kl", v, jnp.asarray(w2),
                   precision=PRECISION)
    return v


def _itiles_core(Xt, ln):
    """Inverse of `_tiles_core`: input (..., l1, l2) in (k1, k2) tile
    layout, output natural-order (..., ln). Runs the mirrored
    four-step (DFT over k2, conjugate twiddle, DFT over k1) — no
    transposes in either direction."""
    l1, l2, w1, w2, tw = _tables(ln)
    lead = Xt.shape[:-2]
    v = jnp.einsum("...kl,jl->...kj", Xt, jnp.conj(jnp.asarray(w2)),
                   precision=PRECISION)
    v = v * jnp.conj(jnp.asarray(tw))
    v = jnp.einsum("...kj,ik->...ij", v, jnp.conj(jnp.asarray(w1)),
                   precision=PRECISION)
    return v.reshape(lead + (ln,)) / ln


def fft_tiles(x, n, axis=-1):
    """Forward transform into the (k1, k2) tile domain (see
    `_tiles_core`); pair with `ifft_tiles`. Caller must check
    `mx_supported(n)`."""
    x = jnp.asarray(x)
    if axis not in (-1, x.ndim - 1):
        x = jnp.moveaxis(x, axis, -1)
    return _fft_tiles_jit(x, int(n))


@functools.partial(jax.jit, static_argnums=(1,))
def _fft_tiles_jit(x, ln):
    x = _fit_last(x, ln).astype(jnp.complex64)
    return _tiles_core(x, ln)


def ifft_tiles(Xt, n):
    """Inverse of `fft_tiles` along the last two (tile) axes; returns
    complex natural-order samples on the last axis."""
    return _ifft_tiles_jit(jnp.asarray(Xt), int(n))


@functools.partial(jax.jit, static_argnums=(1,))
def _ifft_tiles_jit(Xt, ln):
    return _itiles_core(Xt.astype(jnp.complex64), ln)


def _fft_core(x, ln):
    """Four-step complex DFT of length `ln` over the LAST axis; x is
    complex64 with x.shape[-1] == ln. ln must be pow2 with both
    four-step factors <= _MAX_FACTOR (callers guarantee)."""
    lead = x.shape[:-1]
    v = _tiles_core(x, ln)
    # bin order: X[k1 + L1*k2] -> transpose (k1, k2) -> (k2, k1)
    return jnp.swapaxes(v, -2, -1).reshape(lead + (ln,))


def _fit_last(x, ln):
    if x.shape[-1] < ln:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, ln - x.shape[-1])]
        x = jnp.pad(x, pad)
    elif x.shape[-1] > ln:
        x = x[..., :ln]
    return x


@functools.partial(jax.jit, static_argnums=(1, 2))
def _fft_jit(x, ln, axis):
    x = jnp.moveaxis(x, axis, -1)
    x = _fit_last(x, ln).astype(jnp.complex64)
    return jnp.moveaxis(_fft_core(x, ln), -1, axis)


def ifft(x, n=None, axis=-1):
    x = jnp.asarray(x)
    ln = x.shape[axis] if n is None else int(n)
    if not mx_supported(ln):
        return jnp.fft.ifft(x, n=n, axis=axis)
    return jnp.conj(fft(jnp.conj(x), n=ln, axis=axis)) / ln


def rfft(x, n=None, axis=-1):
    """Real-input FFT (first n//2+1 bins) via even/odd packing: one
    complex four-step of length n/2 plus an elementwise untwist —
    half the matmul FLOPs of realify-and-fft (the standard real-FFT
    halving, chosen over a real-matrix DFT because the half-length
    complex core reuses the MXU-tiled four-step)."""
    x = jnp.asarray(x)
    ln = x.shape[axis] if n is None else int(n)
    if not mx_supported(ln) or jnp.iscomplexobj(x):
        return jnp.fft.rfft(x, n=n, axis=axis)
    return _rfft_jit(x, ln, axis)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _rfft_jit(x, ln, axis):
    x = jnp.moveaxis(x, axis, -1)
    x = _fit_last(x, ln).astype(jnp.float32)
    h = ln // 2
    lead = x.shape[:-1]
    # pack even/odd samples: z[m] = x[2m] + i x[2m+1]
    pair = x.reshape(lead + (h, 2))
    z = lax.complex(pair[..., 0], pair[..., 1])
    Z = _fft_core(z, h)
    # Z[(h-k) mod h]: k=0 -> Z[0], k>0 -> Z[h-k]
    Zr = jnp.conj(jnp.concatenate(
        [Z[..., :1], jnp.flip(Z[..., 1:], axis=-1)], axis=-1))
    Xe = 0.5 * (Z + Zr)
    Xo = -0.5j * (Z - Zr)
    Xk = Xe + jnp.asarray(_pack_tw(ln)) * Xo        # bins 0..h-1
    # bin h: Xe and Xo are h-periodic, twiddle at k=h is -1
    Xny = jnp.real(Z[..., :1]) - jnp.imag(Z[..., :1])
    out = jnp.concatenate([Xk, Xny.astype(Xk.dtype)], axis=-1)
    return jnp.moveaxis(out, -1, axis)


def irfft(x, n=None, axis=-1):
    """Inverse of rfft (real output length n); even/odd packing like
    `rfft` — elementwise twist then one length-n/2 complex inverse."""
    x = jnp.asarray(x)
    nb = x.shape[axis]
    ln = 2 * (nb - 1) if n is None else int(n)
    if not mx_supported(ln):
        return jnp.fft.irfft(x, n=n, axis=axis)
    return _irfft_jit(x, ln, axis)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _irfft_jit(x, ln, axis):
    h = ln // 2
    xm = jnp.moveaxis(x, axis, -1).astype(jnp.complex64)
    xm = _fit_last(xm, h + 1)
    Xk = xm[..., :h]
    # X[h-k] for k = 0..h-1: k=0 -> X[h], k>0 -> X[h-k]
    Xr = jnp.conj(jnp.flip(xm[..., 1:], axis=-1))
    Xe = 0.5 * (Xk + Xr)
    Xo = 0.5 * jnp.conj(jnp.asarray(_pack_tw(ln))) * (Xk - Xr)
    Z = Xe + 1j * Xo
    # ifft_h via conjugate trick on the forward core
    z = jnp.conj(_fft_core(jnp.conj(Z), h)) / h
    lead = z.shape[:-1]
    out = jnp.stack([jnp.real(z), jnp.imag(z)], axis=-1).reshape(
        lead + (ln,))
    return jnp.moveaxis(out, -1, axis)
